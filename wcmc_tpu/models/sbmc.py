"""SBMC "Multisteps" — sample-space kernel-splatting denoiser.

TPU-native rebuild of the [Gharbi 2019] backbone the reference imports
from the external ``sbmc`` package (reference train_sbmc.py:30,80-94).
Observable contract reproduced: input ``{'radiance' (B,S,H,W,3),
'features' (B,S,H,W,C)}``, output a denoised image ``(B,H,W,3)`` of the
same spatial size (reference interfaces.py:420-445); internally a
per-sample embedding, multiple rounds of sample<->pixel context
propagation through a U-Net, and per-sample splatting kernels whose
accumulated contribution is weight-normalized.

The splat runs through the Pallas scatter op on TPU
(:mod:`wcmc_tpu.ops.splat`).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from wcmc_tpu.models.blocks import UNet
from wcmc_tpu.ops.splat import splat_normalized, splat_normalized_logits


class Multisteps(nn.Module):
    n_in: int
    ksize: int = 21
    n_steps: int = 3
    width: int = 128
    dtype: jnp.dtype | None = None   # bf16 compute on TPU; params stay f32
    # sample-parallel mode: spp axis sharded over this mesh axis; the
    # sample-context means and splat normalization become collectives
    sample_axis_name: str | None = None
    # Splat-weight parameterization. "exp" (default) is the upstream
    # KernelWeighting semantics (reference train_sbmc.py:30 via the
    # sbmc pkg's CUDA/Halide op): w = exp(logit), normalized only by
    # the TOTAL weight splatted to each pixel — a sample can assign
    # itself near-zero total weight, which is the paper's outlier
    # (firefly) rejection mechanism; stabilized per OUTPUT pixel in
    # ops/splat.py::splat_normalized_logits (the r4 per-image max
    # shift made eps dominate the denominator as soon as any logit
    # spiked, collapsing the output to zero — see the op docstring).
    # "softmax" pins every sample's kernel sum to exactly 1, making
    # relative down-weighting across samples impossible; its only
    # anti-firefly strategy is delta kernels, and measured on the toy
    # corpus it collapses to identity at every lr tried — kept only
    # as an ablation knob (experiments/sample_space/README.md).
    splat_weighting: str = "exp"
    # Splat-logit standardization gain: l -> B*(l - mean)/sqrt(var+1).
    # The normalized splat is invariant to logit SHIFT but not SPREAD,
    # and nothing in the loss penalizes spread, so sharpening pressure
    # grows it without bound (measured r5 on-chip: +-0.09 at init ->
    # +-44,000 within 128 warmup steps at the reference lr 5e-4, then
    # NaN via the 1/(den+eps) gradient amplifier in weight-starved
    # pixels; a hard tanh bound contained the numerics but the raw
    # head ran to +-4e19 and saturated the rails — training froze at
    # val 454 with zero gradient).  Standardizing per image makes the
    # global-scale direction asymptotically NULL in the loss landscape
    # (Adam has nothing to chase), keeps gradients alive at any
    # underlying scale, and the +1 variance floor leaves small logits
    # untouched at init (no noise amplification).  Spread after
    # standardization ~ +-4 sigma * B: rejection ratios ~ e^80 at
    # B=10, far beyond what firefly suppression needs.
    splat_logit_gain: float = 10.0

    def _stage_rms(self, v, ref=None):
        """Per-image RMS normalization at a stage boundary.

        NOTE(stability): deviation from the upstream sbmc Multisteps
        (reference train_sbmc.py:30), which has no normalization.  The
        trunk composes ~50 convs (3 UNets + MLP chains); the splat
        loss rewards kernel sharpness, and that gradient distributes a
        tiny gain increase over EVERY layer, which compounds
        exponentially in depth — measured r5 (CPU, lr 1e-3): per-UNet
        gain drifted from ~1 to ~1e3 within 3 optimizer steps, raw
        logits 0.09 -> 4e7, f32 inf by step 19.  RMS-normalizing each
        stage output makes every stage's scale direction null in the
        loss landscape, so there is nothing for the optimizer to
        chase.  Returns v (and ref, scaled by the SAME factor, when
        the caller must stay consistent — e.g. the sample mean that
        belongs to x)."""
        import jax

        ms = jnp.mean(jnp.square(v.astype(jnp.float32)),
                      axis=tuple(range(1, v.ndim)), keepdims=True)
        if self.sample_axis_name is not None and v.ndim == 4:
            # (b, s_local, hw, c): the moment spans the sharded spp axis
            ms = jax.lax.pmean(ms, self.sample_axis_name)
        r = jax.lax.rsqrt(ms + 1e-8)
        if ref is None:
            return (v * r.astype(v.dtype)).astype(v.dtype)
        rr = r.reshape(r.shape[0], *([1] * (ref.ndim - 1)))
        return ((v * r.astype(v.dtype)).astype(v.dtype),
                (ref * rr.astype(ref.dtype)).astype(ref.dtype))

    def _chain_params(self, name, dims):
        ws, bs = [], []
        for i, (ci, co) in enumerate(zip(dims[:-1], dims[1:])):
            ws.append(self.param(
                f"{name}_w{i}", nn.initializers.lecun_normal(), (ci, co)
            ))
            bs.append(self.param(
                f"{name}_b{i}", nn.initializers.zeros, (co,)
            ))
        return ws, bs

    @nn.compact
    def __call__(self, batch: dict) -> jnp.ndarray:
        import jax

        from wcmc_tpu.ops.pathnet_fused import pathnet_embed, pathnet_head

        radiance = batch["radiance"]
        features = batch["features"]
        b, s, h, w, f = features.shape
        assert f == self.n_in, f"Multisteps expects {self.n_in} channels, got {f}"

        wd = self.width
        leaky = ("leaky_relu",) * 3
        cdtype = self.dtype if self.dtype is not None else jnp.float32

        # fused per-sample embedding + first context mean
        # (ops/pathnet_fused.py — hidden activations stay in VMEM)
        xf = features.reshape(b, s, h * w, f).astype(cdtype)
        ws_e, bs_e = self._chain_params("embedding", (f, wd, wd, wd))
        # compute_dx=True: under use_llpm_buf the features embed the
        # LEARNED p-buffer, so d(features) must flow to the backbone
        x, mean = pathnet_embed(xf, ws_e, bs_e, leaky, True)
        x, mean = self._stage_rms(x, mean)

        for step in range(self.n_steps):
            ctx = mean.reshape(b, h, w, wd)
            if self.sample_axis_name is not None:
                ctx = jax.lax.pmean(ctx, self.sample_axis_name)
            ctx = UNet(
                self.width, num_levels=3, increase_factor=2.0, num_convs=3,
                width=self.width, ksize=3, output_type="leaky_relu",
                pooling="max", dtype=self.dtype, name=f"propagation_{step}",
            )(ctx.astype(cdtype))
            ctx = self._stage_rms(ctx)
            # fused update chain over [x | broadcast_S(ctx)]; the next
            # step's sample mean comes out of the same kernel
            ws_u, bs_u = self._chain_params(
                f"update_{step}", (2 * wd, wd, wd)
            )
            ctx_flat = ctx.reshape(b, h * w, wd).astype(jnp.float32)
            last = step == self.n_steps - 1
            if last:
                x = pathnet_head(x, ctx_flat, ws_u, bs_u, leaky[:2],
                                 False, cdtype)
            else:
                x, ssum, _ = pathnet_head(x, ctx_flat, ws_u, bs_u,
                                          leaky[:2], True, cdtype)
                x, mean = self._stage_rms(x, ssum / s)

        x = x.reshape(b * s, h, w, wd)
        logits = nn.Conv(
            self.ksize**2, (1, 1), dtype=self.dtype, name="kernel_head"
        )(x).astype(jnp.float32)
        logits = logits.reshape(b, s, h, w, self.ksize**2)
        if self.splat_weighting == "softmax":
            weights = nn.softmax(logits, axis=-1)
            return splat_normalized(
                radiance, weights, self.ksize,
                sample_axis_name=self.sample_axis_name,
            )
        # standardize per image (see splat_logit_gain above); under
        # sample sharding the moments become pmeans so every shard
        # normalizes identically
        center = jnp.mean(logits, axis=(1, 2, 3, 4), keepdims=True)
        if self.sample_axis_name is not None:
            center = jax.lax.pmean(center, self.sample_axis_name)
        var = jnp.mean((logits - center) ** 2, axis=(1, 2, 3, 4),
                       keepdims=True)
        if self.sample_axis_name is not None:
            var = jax.lax.pmean(var, self.sample_axis_name)
        logits = (self.splat_logit_gain * (logits - center)
                  * jax.lax.rsqrt(var + 1.0))
        # soft-cap AFTER standardization: whole-tensor moments cannot
        # bound a SPARSE outlier (measured r5: one runaway tap-bias at
        # raw +1568 standardizes to z~21 -> l'~210 under FMSE, a
        # winner-take-all translated output whose gradients are all
        # exactly dead). tanh keeps the bulk (+-10 = 1 sigma) nearly
        # linear, rails pathological spikes at +-25 — a spread the
        # capped bulk survives with LIVE gradients (e^-25 weights vs
        # the 1e-12 splat eps), so a capped spike remains escapable.
        logits = 25.0 * jnp.tanh(logits / 25.0)
        return splat_normalized_logits(
            radiance, logits, self.ksize, eps=1e-12,
            sample_axis_name=self.sample_axis_name,
        )

    def __str__(self):
        return f"Multisteps i{self.n_in} k{self.ksize} s{self.n_steps} w{self.width}"
