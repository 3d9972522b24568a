"""Fused Pallas 2-D convolution for the denoiser conv chains.

The reference's KPCN/SBMC backbones spend most of their FLOPs in
stacked small convolutions (9x 5x5 VALID convs per KPCN branch,
reference test_models.py:218-219; 3x3 SAME chains in the PathNet
U-Nets). XLA's TPU conv emitter is poor on these channel counts
(measured on v5e: ~100 TFLOP/s on the 100-channel 5x5 layers, and as
low as ~10-25 TFLOP/s on the 64-channel 3x3 U-Net layers), because the
per-tap contraction K = Cin pads badly against the 128-wide MXU.

Kernel design ("dy-packed" implicit GEMM, channels-last, no layout
changes):

* grid (B, row-bands). Each band reads a (TB, W, Cin) main block plus
  an 8-row halo block (expressible as a second BlockSpec because TB is
  a multiple of 8), builds the dy-packed patch tensor
  ``P[(r, x), dy*Cin+ci] = X[r+dy, x, ci]`` by lane-concatenation of K
  row-shifted slabs — no sublane shuffles — and issues K matmuls
  ``(TB*W, K*Cin) @ (K*Cin, Cout)``, one per x-tap, applying the dx
  lane shift once on each f32 partial. The packed contraction
  K*Cin (500 for the KPCN chains, 192-576 for the U-Nets) fills the
  MXU's 128-lane K granule that a per-tap K = Cin wastes.
* bias + activation fuse into the store.

Backward: the differentiated path stays entirely in XLA (see the
NOTE(perf) in ``_conv2d_fwd``).

STATUS (v5e, measured): wins layer microbenches (129 vs 96 TFLOP/s
mid-layer, 149 vs 114 head; scripts/bench_conv5.py) but loses in
context — train step 54.5 -> 59.6 ms (the custom-call boundary breaks
XLA's cross-layer autodiff fusions even with an all-XLA vjp), and
128-px-tile inference 5.8 -> 10.8 ms per 8-tile batch (per-layer band
padding + unfused epilogues dominate at small H).  Dispatch is
therefore opt-in (interfaces.BaseInterface._val_model,
WCMC_FUSED_INFERENCE=1).

Wide-band postscript (r4): the "revisit at W ~ 1920" idea is closed.
At W = 1984 a single 8-row band needs ~49 MB of VMEM blocks (the
dy-packed patch plane alone is ~2 MB/row at K*Cin = 500), so
``_band_rows`` returns 0 and ``conv2d`` silently falls back to XLA —
the r4 full-width-band probe (WCMC_FUSED_INFERENCE=1, 962 ms/frame)
therefore measured pure XLA.  Engaging the kernel there would need a
2-D (row-band x column-band) grid; not worth building, because
full-width bands are 2.3x WORSE than 256-px square tiles end-to-end
(962 vs 415 ms/frame, scripts/r4c_inference.sh) — batch-1 wide-spatial
conv geometry is slow regardless of who emits the conv.

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

_HALO = 8   # halo block rows; covers ksize - 1 for ksize <= 9


def _act_grad_mask(act, y, g):
    if act in (None, "linear"):
        return g
    if act == "relu":
        return jnp.where(y > 0, g, 0.0)
    if act == "leaky_relu":
        return jnp.where(y > 0, g, 0.01 * g)
    raise ValueError(act)


def _conv_kernel(xm_ref, xh_ref, w_ref, b_ref, y_ref, *, ksize, tb, ow, act):
    xm = xm_ref[0]                       # (TB, W, Cin)
    xh = xh_ref[0]                       # (8, W, Cin)
    # dy-packed patches: lane-concat of K row-shifted slabs; the row
    # shifts are leading-dim slices/concats (tile-plane moves, no
    # sublane shuffles)
    slabs = [xm]
    for dy in range(1, ksize):
        slabs.append(jnp.concatenate([xm[dy:], xh[:dy]], axis=0))
    p = jnp.concatenate(slabs, axis=2)   # (TB, W, K*Cin)

    cout = y_ref.shape[3]
    out = jnp.zeros((tb, ow, cout), jnp.float32)
    for dx in range(ksize):
        c = jax.lax.dot_general(
            p, w_ref[dx], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out += c[:, dx:dx + ow]
    out += b_ref[0]
    y_ref[0] = _ACTS[act](out).astype(y_ref.dtype)


def _sub8(n: int) -> int:
    return -(-n // 8) * 8


def _band_rows(h_out: int, w: int, cin: int, cout: int, ksize: int) -> int:
    """Largest multiple-of-8 band height whose blocks + stack fit VMEM."""
    pad = _pk._lane_pad
    plane_in = _sub8(w) * pad(cin) * 2
    plane_p = _sub8(w) * pad(ksize * cin) * 2
    plane_acc = _sub8(w) * pad(cout) * 4
    plane_out_acc = _sub8(w - ksize + 1) * pad(cout) * 4
    plane_out = _sub8(w - ksize + 1) * pad(cout) * 2
    w_bytes = ksize * _sub8(ksize * cin) * pad(cout) * 2
    fixed = 2 * _HALO * plane_in + 2 * w_bytes
    per_row = (2 * plane_in          # main block, double-buffered
               + 2 * plane_out       # output block, double-buffered
               + plane_p + plane_acc + plane_out_acc)   # kernel stack
    # Empirical: Mosaic's stack allocator reuses the slab/concat
    # temporaries, but its scoped-vmem accounting inside a large jitted
    # program is stricter than standalone (a 13 MiB budget compiled
    # standalone yet OOM'd by 1.1 MiB inside the full train step at the
    # KPCN mid shape). 9 MiB keeps every model shape compiling with
    # ~3k-row dots per band (throughput measured unchanged vs 64-row
    # bands).
    budget = 9 * 1024 * 1024 - fixed
    tb = (budget // per_row) // 8 * 8
    if tb < 8:
        return 0   # does not fit an 8-row band; caller falls back to XLA
    return int(min(_sub8(h_out), tb, 64))


@functools.partial(jax.jit, static_argnames=("ksize", "act", "out_dtype"))
def _conv_fwd_pallas(x, wr, bias, ksize, act, out_dtype):
    """x (B, H, W, Cin); wr (K, K*Cin, Cout) dy-packed; VALID conv."""
    b, h, w, cin = x.shape
    cout = wr.shape[-1]
    h_out, w_out = h - ksize + 1, w - ksize + 1
    tb = _band_rows(h_out, w, cin, cout, ksize)
    assert tb, "caller must check _band_rows > 0 before dispatching"
    n_bands = -(-h_out // tb)
    hp = n_bands * tb + _HALO
    if hp != h:
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, 0), (0, 0)))

    y = pl.pallas_call(
        functools.partial(_conv_kernel, ksize=ksize, tb=tb, ow=w_out,
                          act=act),
        grid=(b, n_bands),
        in_specs=[
            pl.BlockSpec((1, tb, w, cin), lambda bi, t: (bi, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _HALO, w, cin),
                         lambda bi, t: (bi, (t + 1) * (tb // _HALO), 0, 0),
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
    )(x, x, wr, bias.reshape(1, -1).astype(jnp.float32))
    return y[:, :h_out]


def _reshape_w(w, dtype):
    """(K, K, Cin, Cout) -> dy-packed (K_dx, K_dy*Cin, Cout)."""
    k, _, cin, cout = w.shape
    return jnp.transpose(w, (1, 0, 2, 3)).reshape(
        k, k * cin, cout
    ).astype(dtype)


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
    if _use_pallas() and _band_rows(x.shape[1] - ksize + 1, x.shape[2],
                                    x.shape[3], w.shape[-1], ksize):
        return _conv_fwd_pallas(x, _reshape_w(w, x.dtype), bias, ksize,
                                act, x.dtype)
    return _conv_xla(x, w, bias, ksize, act)


def _conv2d_fwd(x, w, bias, ksize, act):
    # NOTE(perf): under differentiation (training) the conv runs through
    # XLA, NOT the Pallas kernel: the fwd microbench win (~1.3x at the
    # KPCN shapes) was measured to LOSE at the full-step level (54.5 ->
    # 58.9 ms) because the custom-call boundary breaks XLA's
    # dgrad/wgrad/bias/optimizer fusions around each layer. The Pallas
    # path serves the primal-only (validation/inference) calls, where
    # fwd throughput is everything.
    y = _conv_xla(x, w, bias, ksize, act)
    return y, (x, w, y)


def _conv2d_bwd(ksize, act, res, g):
    x, w, y = res
    dz = _act_grad_mask(act, y, g.astype(jnp.float32)).astype(x.dtype)
    k = ksize - 1
    # dgrad in XLA for the same reason as the fwd rule above: keeping
    # the whole differentiated path in XLA preserves its cross-layer
    # fusions (a Pallas dgrad was net-slower at the step level).
    dz_pad = jnp.pad(dz, ((0, 0), (k, k), (k, k), (0, 0)))
    dx = jax.lax.conv_general_dilated(
        dz_pad, _flip_w(w).astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)

    # wgrad via XLA's own transposed-conv path (~80% MXU on v5e).
    # Pure compute-dtype conv: with bf16 x the cotangent must be bf16
    # too (mixed-dtype conv transpose is rejected), so dw rounds
    # through bf16 exactly as the unfused flax nn.Conv(dtype=bf16)
    # path does (MXU accumulation is f32 either way); the astype
    # transpose restores f32 param grads.
    def ref_conv(w_):
        return jax.lax.conv_general_dilated(
            x, w_.astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    dw = jax.vjp(ref_conv, w)[1](dz)[0]
    db = jnp.sum(dz.astype(jnp.float32), axis=(0, 1, 2))
    return dx, dw, db


conv2d.defvjp(_conv2d_fwd, _conv2d_bwd)
