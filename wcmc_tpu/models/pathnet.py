"""PathNet — the path embedding network.

Faithful-capability redesign of the one novel model in the reference
(reference support/networks.py:7-42): per-sample 1x1 embedding, mean
reduction over the sample axis, U-Net context propagation, broadcast
concat, 1x1 head.

Layout: input ``batch['paths']`` is ``(B, S, H, W, 36)`` channels-last;
output is ``(B, S, H, W, outc)``.  The per-sample 1x1 chains run on the
flattened ``(B*S, H, W, C)`` view, which XLA lowers to large batched
matmuls on the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from wcmc_tpu.models.blocks import UNet, dual_unet_apply


class PathNet(nn.Module):
    ic: int = 36
    intermc: int = 64
    outc: int = 3
    dtype: jnp.dtype | None = None   # bf16 compute on TPU; params stay f32
    # sample-parallel mode: when set, the spp axis is sharded over this
    # mesh axis and the sample-mean reduction becomes a pmean over ICI
    sample_axis_name: str | None = None

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
    def __call__(self, samples: dict) -> jnp.ndarray:
        from wcmc_tpu.ops.pathnet_fused import pathnet_embed, pathnet_head

        paths = samples["paths"]
        b, s, h, w, nf = paths.shape
        assert nf == self.ic, f"PathNet expects {self.ic} path channels, got {nf}"

        ic = self.intermc
        ws_e, bs_e = self._chain_params("embedding", (nf, ic, ic, ic))
        ws_h, bs_h = self._chain_params("final", (2 * ic, 2 * ic, self.outc))

        x = paths.reshape(b, s, h * w, nf)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        # fused embedding + sample-mean: hidden activations and the
        # f32 mean accumulator stay in VMEM (ops/pathnet_fused.py)
        e, reduced = pathnet_embed(
            x, ws_e, bs_e, ("relu", "relu", "linear")
        )
        reduced = reduced.reshape(b, h, w, ic)
        if self.sample_axis_name is not None:
            import jax

            reduced = jax.lax.pmean(reduced, self.sample_axis_name)
        if self.dtype is not None:
            reduced = reduced.astype(self.dtype)
        propagated = UNet(
            ic, num_levels=3, increase_factor=2.0, num_convs=3,
            width=ic, ksize=3, output_type="leaky_relu",
            pooling="max", dtype=self.dtype, name="propagation",
        )(reduced)

        # fused head over [e | broadcast_S(ctx)] — the concat never
        # materializes; emits f32 directly
        out = pathnet_head(
            e, propagated.reshape(b, h * w, ic).astype(jnp.float32),
            ws_h, bs_h, ("relu", "relu"),
        )
        return out.reshape(b, s, h, w, self.outc)

    def __str__(self):
        return f"PathNet i{self.ic}in{self.intermc}o{self.outc}"


def _block_diag(a, b):
    za = jnp.zeros((a.shape[0], b.shape[1]), a.dtype)
    zb = jnp.zeros((b.shape[0], a.shape[1]), b.dtype)
    return jnp.concatenate(
        [jnp.concatenate([a, za], axis=1), jnp.concatenate([zb, b], axis=1)],
        axis=0,
    )


def dual_pathnet_apply(model_d, params_d, model_s, params_s, batch,
                       with_moments=False, cmajor=False):
    """Run the diffuse and specular PathNets as ONE fused kernel pass.

    Both branches read the same ``batch['paths']``; as two separate
    module applies, every per-pixel kernel runs twice at 64-wide
    channels (25-50% MXU utilization) and the paths tensor is read
    twice. Here the branch weight matrices are combined — concatenated
    at the input layer, block-diagonal in the hidden layers — so one
    kernel pass computes both branches at 128/256-wide channels (full
    MXU), and jax autodiff slices the combined weight gradients back to
    the per-branch parameters through the concat/block-diag ops.

    The UNet context propagation runs as one dual pass too — its
    narrow (64-channel) levels merged block-diagonally, full-width
    levels per-branch (blocks.dual_unet_apply).

    Returns (p_diffuse, p_specular), each (B, S, H, W, outc) f32 —
    identical math to two separate PathNet applies (the off-diagonal
    weight blocks are structural zeros). With ``cmajor`` the branches
    come back as (B, S, outc, H, W) — the dense layout the manifold
    losses consume (losses._prep_pair NOTE(perf)).
    """
    import jax

    from wcmc_tpu.ops.pathnet_fused import pathnet_embed, pathnet_head

    ic, outc = model_d.intermc, model_d.outc
    assert (
        model_s.intermc == ic and model_s.outc == outc
        and model_s.ic == model_d.ic
        and model_s.sample_axis_name == model_d.sample_axis_name
    ), "dual_pathnet_apply requires identically-configured branches"

    paths = batch["paths"]
    b, s, h, w, nf = paths.shape

    ws_e = [
        jnp.concatenate(
            [params_d["embedding_w0"], params_s["embedding_w0"]], axis=1
        ),
        _block_diag(params_d["embedding_w1"], params_s["embedding_w1"]),
        _block_diag(params_d["embedding_w2"], params_s["embedding_w2"]),
    ]
    bs_e = [
        jnp.concatenate(
            [params_d[f"embedding_b{i}"], params_s[f"embedding_b{i}"]]
        )
        for i in range(3)
    ]

    x = paths.reshape(b, s, h * w, nf)
    if model_d.dtype is not None:
        x = x.astype(model_d.dtype)
    e, mean = pathnet_embed(x, ws_e, bs_e, ("relu", "relu", "linear"))

    mean = mean.reshape(b, h, w, 2 * ic)
    if model_d.sample_axis_name is not None:
        mean = jax.lax.pmean(mean, model_d.sample_axis_name)
    if model_d.dtype is not None:
        mean = mean.astype(model_d.dtype)

    unet = UNet(
        ic, num_levels=3, increase_factor=2.0, num_convs=3, width=ic,
        ksize=3, output_type="leaky_relu", pooling="max",
        dtype=model_d.dtype,
    )
    # both branches' context UNets in one pass, narrow levels merged
    # block-diagonally (see blocks.dual_unet_apply NOTE(perf))
    ctx_d, ctx_s = dual_unet_apply(
        unet, params_d["propagation"], params_s["propagation"],
        mean[..., :ic], mean[..., ic:],
    )
    ctx = jnp.concatenate(
        [ctx_d, ctx_s], axis=-1
    ).reshape(b, h * w, 2 * ic).astype(jnp.float32)

    # head layer 1 per branch: rows [:ic] multiply e, rows [ic:] multiply
    # ctx — combine each half block-diagonally, then stack (e rows on
    # top) to match pathnet_head's split at Ce = 2*ic
    w0d, w0s = params_d["final_w0"], params_s["final_w0"]
    ws_h = [
        jnp.concatenate(
            [_block_diag(w0d[:ic], w0s[:ic]),
             _block_diag(w0d[ic:], w0s[ic:])],
            axis=0,
        ),
        _block_diag(params_d["final_w1"], params_s["final_w1"]),
    ]
    bs_h = [
        jnp.concatenate([params_d[f"final_b{i}"], params_s[f"final_b{i}"]])
        for i in range(2)
    ]

    if with_moments:
        out, ssum, ssq = pathnet_head(
            e, ctx, ws_h, bs_h, ("relu", "relu"), True, jnp.float32, cmajor
        )
        moments = (ssum.reshape(b, h, w, 2 * outc),
                   ssq.reshape(b, h, w, 2 * outc))
        if cmajor:
            out = out.reshape(b, s, 2 * outc, h, w)
            return out[:, :, :outc], out[:, :, outc:], moments
        out = out.reshape(b, s, h, w, 2 * outc)
        return out[..., :outc], out[..., outc:], moments
    out = pathnet_head(e, ctx, ws_h, bs_h, ("relu", "relu"), False,
                       jnp.float32, cmajor)
    if cmajor:
        out = out.reshape(b, s, 2 * outc, h, w)
        return out[:, :, :outc], out[:, :, outc:]
    out = out.reshape(b, s, h, w, 2 * outc)
    return out[..., :outc], out[..., outc:]
