"""Reusable Flax building blocks (channels-last, NHWC).

TPU-native counterparts of the conv-stack / U-Net primitives the
reference imports from the external ``sbmc.modules`` package
(reference support/networks.py:5,18-24): a plain convolution chain and
a symmetric encoder/decoder with skip connections.  Convolutions carry
``preferred_element_type=float32`` accumulation via Flax defaults and
map straight onto the MXU; ``VALID`` chains shrink deterministically so
all crop bookkeeping stays static under jit.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

_ACTIVATIONS: dict[str, Callable] = {
    "linear": lambda x: x,
    "relu": nn.relu,
    "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.01),
    "elu": nn.elu,
}


class FusedConv(nn.Module):
    """``nn.Conv``-compatible 2-D conv computed by the fused Pallas
    implicit-GEMM kernel (ops/conv5.py) on TPU — bias and activation
    fuse into the store, dgrad reuses the kernel, wgrad stays in XLA.
    Param tree matches ``nn.Conv`` (kernel (K, K, Cin, Cout) +
    bias (Cout,), lecun_normal/zeros init) so checkpoints are
    layout-identical to the unfused chain.
    """

    features: int
    ksize: int
    act: str | None = None
    pad: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        from wcmc_tpu.ops.conv5 import conv2d

        k = self.ksize
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if self.pad:
            p = (k - 1) // 2
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        return conv2d(x, w, b, k, self.act)


class ConvChain(nn.Module):
    """``depth`` stacked convolutions; hidden activations ReLU, output
    activation configurable.

    shrink per conv (``pad=False``): ``ksize - 1`` pixels.

    ``fused=True`` computes each layer with the Pallas implicit-GEMM
    conv (ops/conv5.py) — same math and param tree, ~1.3x the MXU
    throughput of XLA's conv emitter at the KPCN 100-channel 5x5
    shapes. Requires activations in {linear, relu, leaky_relu}.
    """

    out_channels: int
    width: int = 64
    depth: int = 3
    ksize: int = 3
    pad: bool = False
    output_type: str = "linear"
    hidden_activation: str = "relu"
    fused: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        if self.fused:
            for i in range(self.depth - 1):
                x = FusedConv(
                    self.width, self.ksize, act=self.hidden_activation,
                    pad=self.pad, dtype=self.dtype, name=f"Conv_{i}",
                )(x)
            x = FusedConv(
                self.out_channels, self.ksize, act=None, pad=self.pad,
                dtype=self.dtype, name=f"Conv_{self.depth - 1}",
            )(x)
            return _ACTIVATIONS[self.output_type](x)
        padding = "SAME" if self.pad else "VALID"
        act = _ACTIVATIONS[self.hidden_activation]
        for _ in range(self.depth - 1):
            x = nn.Conv(
                self.width, (self.ksize, self.ksize), padding=padding,
                dtype=self.dtype,
            )(x)
            x = act(x)
        x = nn.Conv(
            self.out_channels, (self.ksize, self.ksize), padding=padding,
            dtype=self.dtype,
        )(x)
        return _ACTIVATIONS[self.output_type](x)

    @staticmethod
    def shrink(depth: int, ksize: int, pad: bool) -> int:
        return 0 if pad else depth * (ksize - 1)


class PixelMLP(nn.Module):
    """Per-pixel MLP — a ``ConvChain(ksize=1)`` computed by the fused
    Pallas chain (ops/mlp_fused.py) so hidden activations never touch
    HBM. Same math and init as the unfused chain (lecun_normal /
    zero-bias, matching nn.Conv defaults); params stay f32 and the
    chain computes in ``dtype``.

    ``compute_dx`` should be False when the input is data (no gradient
    consumer), which skips the dx write in the backward kernel.
    """

    features: Sequence[int]
    acts: Sequence[str]
    compute_dx: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        from wcmc_tpu.ops.mlp_fused import fused_mlp

        cin = x.shape[-1]
        ws, bs = [], []
        for i, f in enumerate(self.features):
            ws.append(self.param(
                f"w{i}", nn.initializers.lecun_normal(), (cin, f)
            ))
            bs.append(self.param(f"b{i}", nn.initializers.zeros, (f,)))
            cin = f
        shape = x.shape
        flat = x.reshape(-1, shape[-1])
        if self.dtype is not None:
            flat = flat.astype(self.dtype)
        y = fused_mlp(flat, ws, bs, tuple(self.acts), self.compute_dx)
        return y.reshape(shape[:-1] + (self.features[-1],))


class UNet(nn.Module):
    """Symmetric encoder/decoder ("Autoencoder" in the reference's
    upstream naming) with max-pool downsampling, nearest upsampling and
    skip concatenation.  ``SAME`` padding: output matches input size
    (spatial dims must be divisible by ``2**(num_levels - 1)``).
    """

    out_channels: int
    num_levels: int = 3
    increase_factor: float = 2.0
    num_convs: int = 3
    width: int = 64
    ksize: int = 3
    output_type: str = "leaky_relu"
    pooling: str = "max"
    dtype: jnp.dtype | None = None

    def _convs(self, x, width, n):
        for _ in range(n):
            x = nn.Conv(width, (self.ksize, self.ksize), padding="SAME",
                        dtype=self.dtype)(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
        return x

    @nn.compact
    def __call__(self, x):
        widths = [
            int(self.width * self.increase_factor**lvl)
            for lvl in range(self.num_levels)
        ]
        skips = []
        for lvl in range(self.num_levels - 1):
            x = self._convs(x, widths[lvl], self.num_convs)
            skips.append(x)
            if self.pooling == "max":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        x = self._convs(x, widths[-1], self.num_convs)

        for lvl in reversed(range(self.num_levels - 1)):
            b, h, w, c = x.shape
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = jnp.concatenate([x, skips[lvl]], axis=-1)
            x = self._convs(x, widths[lvl], self.num_convs)

        x = nn.Conv(self.out_channels, (self.ksize, self.ksize),
                    padding="SAME", dtype=self.dtype)(x)
        return _ACTIVATIONS[self.output_type](x)


def _kernel_block_diag(ka, kb):
    """(K,K,Ca,Oa) + (K,K,Cb,Ob) -> (K,K,Ca+Cb,Oa+Ob) with zero
    off-diagonal blocks (branch A reads/writes the leading channels)."""
    kh, kw, ca, oa = ka.shape
    _, _, cb, ob = kb.shape
    top = jnp.concatenate([ka, jnp.zeros((kh, kw, ca, ob), ka.dtype)], 3)
    bot = jnp.concatenate([jnp.zeros((kh, kw, cb, oa), kb.dtype), kb], 3)
    return jnp.concatenate([top, bot], axis=2)


def dual_unet_apply(unet: UNet, params_a, params_b, xa, xb):
    """Run two identically-configured UNets (different weights) as one
    pass, merging the narrow levels block-diagonally.

    NOTE(perf): the flagship PathNet propagation UNets are width 64 —
    a 64-out 3x3 conv wastes half the MXU's 128 output lanes AND half
    its 128-deep reduction granule (per-tap K = 64), measured at only
    ~35 TFLOP/s on v5e, and the full-resolution 64-channel blocks are
    ~10 ms of the train step across the two branches. Merging the two
    branches' convs into block-diagonal 128-channel convs doubles the
    arithmetic (the off-diagonal zero blocks are computed) but
    quadruples the padded MXU utilization — a ~2x net win on those
    blocks. Levels whose combined width exceeds 128 lanes gain nothing
    (they are already lane-aligned), so they run per-branch. Autodiff
    slices the combined weight gradients back to per-branch params
    through the concat/zero-pad ops; the math is identical to two
    separate applies up to f32 summation order.

    ``params_a/b``: the UNets' flax param trees (Conv_i submodules).
    Returns (ya, yb).
    """
    import jax

    widths = [
        int(unet.width * unet.increase_factor**lvl)
        for lvl in range(unet.num_levels)
    ]
    nc, k, dt = unet.num_convs, unet.ksize, unet.dtype
    act = _ACTIVATIONS["leaky_relu"]

    def conv_one(x, p, cout=None):
        w, b = p["kernel"], p["bias"]
        if dt is not None:
            x, w = x.astype(dt), w.astype(dt)
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(y.dtype)

    def conv_merged(x, pa, pb):
        w = _kernel_block_diag(pa["kernel"], pb["kernel"])
        b = jnp.concatenate([pa["bias"], pb["bias"]])
        return conv_one(x, {"kernel": w, "bias": b})

    def block(xa, xb, idx, width):
        """num_convs convs + leaky_relu, merged iff 2*width <= 128
        (the combined tensor persists across the block's convs)."""
        if 2 * width <= 128:
            x = jnp.concatenate([xa, xb], axis=-1)
            for i in range(nc):
                x = act(conv_merged(x, params_a[f"Conv_{idx + i}"],
                                    params_b[f"Conv_{idx + i}"]))
            return x[..., :width], x[..., width:], idx + nc
        for i in range(nc):
            xa = act(conv_one(xa, params_a[f"Conv_{idx + i}"]))
            xb = act(conv_one(xb, params_b[f"Conv_{idx + i}"]))
        return xa, xb, idx + nc

    def pool(x):
        if unet.pooling == "max":
            return nn.max_pool(x, (2, 2), strides=(2, 2))
        return nn.avg_pool(x, (2, 2), strides=(2, 2))

    idx = 0
    skips = []
    for lvl in range(unet.num_levels - 1):
        xa, xb, idx = block(xa, xb, idx, widths[lvl])
        skips.append((xa, xb))
        xa, xb = pool(xa), pool(xb)

    xa, xb, idx = block(xa, xb, idx, widths[-1])

    for lvl in reversed(range(unet.num_levels - 1)):
        xa = jnp.repeat(jnp.repeat(xa, 2, axis=1), 2, axis=2)
        xb = jnp.repeat(jnp.repeat(xb, 2, axis=1), 2, axis=2)
        sa, sb = skips[lvl]
        xa = jnp.concatenate([xa, sa], axis=-1)
        xb = jnp.concatenate([xb, sb], axis=-1)
        xa, xb, idx = block(xa, xb, idx, widths[lvl])

    pa, pb = params_a[f"Conv_{idx}"], params_b[f"Conv_{idx}"]
    oc = unet.out_channels
    if 2 * oc <= 128:
        y = conv_merged(jnp.concatenate([xa, xb], axis=-1), pa, pb)
        xa, xb = y[..., :oc], y[..., oc:]
    else:
        xa, xb = conv_one(xa, pa), conv_one(xb, pb)
    out_act = _ACTIVATIONS[unet.output_type]
    return out_act(xa), out_act(xb)
