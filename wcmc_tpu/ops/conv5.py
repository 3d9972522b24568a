"""Fused Pallas 2-D convolution for the denoiser conv chains.

The reference's KPCN/SBMC backbones spend most of their FLOPs in
stacked small convolutions (9x 5x5 VALID convs per KPCN branch,
reference test_models.py:218-219; 3x3 SAME chains in the U-Nets).
XLA's TPU conv emitter reaches only ~40-60% of the MXU on these
100-channel shapes (measured on v5e: mid-layer fwd ~100 TFLOP/s,
conv->441 head ~60 TFLOP/s), while a Pallas kernel issuing one
per-tap matmul per output row off VMEM-resident operands sustains
~160-200 TFLOP/s (scripts/bench_mxu_shapes.py).

Design (channels-last, no layout changes):

* input block = the full padded image (1, H, W, Cin), VMEM-resident
  across all row-bands of that image (constant index map on the band
  axis); weights (K*K, Cin, Cout) VMEM-resident.
* grid (B, bands); each step computes a band of output rows with a
  ``fori_loop`` over rows; per row the K*K taps accumulate
  ``(OW, Cin) @ (Cin, Cout)`` matmuls in an f32 register accumulator
  (row slabs are leading-dim dynamic loads; x-taps are static sublane
  slices of the slab).
* bias + activation fuse into the store.

Backward: dgrad reuses the same kernel (full-pad the cotangent,
flip/transpose the taps); wgrad/bias-grad go through XLA's own
transposed-conv path (measured at ~80% MXU, the best of the three
already) via ``jax.vjp`` of a reference conv.

SAME padding is handled by pre-padding in XLA and running VALID.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wcmc_tpu.ops import pallas_kernels as _pk

_ACTS = {
    None: lambda x: x,
    "linear": lambda x: x,
    "relu": lambda x: jnp.maximum(x, 0.0),
    "leaky_relu": lambda x: jnp.where(x > 0, x, 0.01 * x),
}


def _act_grad_mask(act, y, g):
    if act in (None, "linear"):
        return g
    if act == "relu":
        return jnp.where(y > 0, g, 0.0)
    if act == "leaky_relu":
        return jnp.where(y > 0, g, 0.01 * g)
    raise ValueError(act)


def _conv_kernel(x_ref, w_ref, b_ref, y_ref, *, ksize, tb, ow, act):
    """Band kernel: for each x-tap dx, accumulate the K row-taps as
    full-width (tb, W, Cin) @ (Cin, Cout) matmuls (M = tb*W — big
    enough to stream the MXU at rate), then apply the dx lane shift
    ONCE on the f32 partial — K shifts per band instead of K^2 per-tap
    shuffles, and no im2col copies at all."""
    t = pl.program_id(1)
    base = t * tb
    cout = y_ref.shape[3]
    out = jnp.zeros((tb, ow, cout), jnp.float32)
    for dx in range(ksize):
        acc = jnp.zeros((tb, x_ref.shape[2], cout), jnp.float32)
        for dy in range(ksize):
            slab = x_ref[0, pl.ds(base + dy, tb)]     # (tb, W, Cin)
            acc += jax.lax.dot_general(
                slab, w_ref[dy * ksize + dx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out += acc[:, dx:dx + ow]
    out += b_ref[0]
    y_ref[0] = _ACTS[act](out).astype(y_ref.dtype)


def _band_rows(h_out: int, w: int, cin: int, cout: int, ksize: int,
               itemsize: int = 2) -> int:
    """Pick the band height: the full-image input block plus the banded
    output block must fit VMEM with Pallas' double buffering (every
    block's lane dim physically pads to 128, sublane dim to 8)."""
    pad = _pk._lane_pad
    sub = lambda n: -(-n // 8) * 8
    in_bytes = sub(h_out + ksize - 1) * sub(w) * pad(cin) * itemsize
    w_bytes = ksize * ksize * sub(cin) * pad(cout) * itemsize
    budget = 14 * 1024 * 1024 - 2 * in_bytes - 2 * w_bytes
    # per band row: double-buffered bf16 output block + two live f32
    # accumulators (full-width partial + shifted output) on the stack
    per_row = (sub(w - ksize + 1) * pad(cout) * itemsize * 2
               + 2 * sub(w) * pad(cout) * 4)
    tb = budget // per_row
    if tb < 8:
        raise ValueError(
            f"conv2d: image {h_out + ksize - 1}x{w}x{cin}->{cout} does "
            "not leave VMEM room for an 8-row output band; tile the "
            "input spatially before calling"
        )
    return int(min(h_out, tb))


@functools.partial(jax.jit, static_argnames=("ksize", "act", "out_dtype"))
def _conv_fwd_pallas(x, wr, bias, ksize, act, out_dtype):
    """x (B, H, W, Cin); wr (K*K, Cin, Cout); VALID conv + bias + act."""
    b, h, w, cin = x.shape
    cout = wr.shape[-1]
    h_out, w_out = h - ksize + 1, w - ksize + 1
    tb = _band_rows(h_out, w, cin, cout, ksize)
    n_bands = -(-h_out // tb)
    hp = n_bands * tb + ksize - 1
    if hp != h:
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, 0), (0, 0)))

    y = pl.pallas_call(
        functools.partial(_conv_kernel, ksize=ksize, tb=tb, ow=w_out,
                          act=act),
        grid=(b, n_bands),
        in_specs=[
            pl.BlockSpec((1, hp, w, cin), lambda bi, t: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wr.shape, lambda bi, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bi, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tb, w_out, cout),
                               lambda bi, t: (bi, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_bands * tb, w_out, cout),
                                       out_dtype),
        interpret=_pk.INTERPRET,
    )(x, wr, bias.reshape(1, -1).astype(jnp.float32))
    return y[:, :h_out]


def _reshape_w(w, dtype):
    """(K, K, Cin, Cout) -> (K*K, Cin, Cout) in compute dtype."""
    k = w.shape[0]
    return w.reshape(k * k, w.shape[2], w.shape[3]).astype(dtype)


def _flip_w(w):
    """dgrad weights: spatially flipped, Cin/Cout transposed."""
    return jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))


def _conv_xla(x, w, bias, ksize, act, pad="VALID"):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + bias.astype(jnp.float32)
    return _ACTS[act](y).astype(x.dtype)


def _use_pallas():
    from wcmc_tpu.ops.kernel_apply import _on_tpu

    return _on_tpu()


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv2d(x, w, bias, ksize: int, act: str | None = None):
    """VALID 2-D conv + bias + activation.

    x (B, H, W, Cin) in compute dtype (bf16 on TPU), w (K, K, Cin, Cout)
    f32 params, bias (Cout,) f32. Returns (B, H-K+1, W-K+1, Cout) in
    x.dtype. For SAME padding, pre-pad x by (K-1)//2 on H/W.
    """
    if _use_pallas():
        return _conv_fwd_pallas(x, _reshape_w(w, x.dtype), bias, ksize,
                                act, x.dtype)
    return _conv_xla(x, w, bias, ksize, act)


def _conv2d_fwd(x, w, bias, ksize, act):
    y = conv2d(x, w, bias, ksize, act)
    return y, (x, w, y)


def _conv2d_bwd(ksize, act, res, g):
    x, w, y = res
    dz = _act_grad_mask(act, y, g.astype(jnp.float32)).astype(x.dtype)
    k = ksize - 1
    if _use_pallas():
        dz_pad = jnp.pad(dz, ((0, 0), (k, k), (k, k), (0, 0)))
        dx = _conv_fwd_pallas(
            dz_pad, _reshape_w(_flip_w(w), x.dtype),
            jnp.zeros((w.shape[2],), jnp.float32), ksize, None, x.dtype,
        )
    else:
        dx = jax.lax.conv_general_dilated(
            jnp.pad(dz, ((0, 0), (k, k), (k, k), (0, 0))),
            _flip_w(w).astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

    # wgrad via XLA's own transposed-conv path (~80% MXU on v5e)
    def ref_conv(w_):
        return jax.lax.conv_general_dilated(
            x, w_.astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    dw = jax.vjp(ref_conv, w)[1](dz.astype(jnp.float32))[0]
    db = jnp.sum(dz.astype(jnp.float32), axis=(0, 1, 2))
    return dx, dw, db


conv2d.defvjp(_conv2d_fwd, _conv2d_bwd)
