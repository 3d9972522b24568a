"""Fused per-pixel MLP (chains of 1x1 convolutions) for PathNet.

Motivation (profiled on v5e, KPCN+manifold train step, bs 8 / 128 px /
spp 8): PathNet's embedding and head chains operate per (sample, pixel)
row on B*S = 64 x 128^2 ~= 1M-row activations. As separate XLA convs,
every hidden layer round-trips a 134-268 MB bf16 activation tensor
through HBM in the forward pass and re-reads it in the backward pass —
~40 ms of the 72 ms step. The chain's FLOPs are trivial (64-128 wide
matmuls); it is purely bandwidth-bound.

This op runs the whole chain in one Pallas kernel per direction:

* forward: stream row tiles, keep every hidden activation in VMEM,
  write only the final output. HBM traffic = read x + write y.
* backward: recompute the hiddens from x (rematerialization — FLOPs are
  free here), backprop through the chain in VMEM, accumulate dW/db in
  f32 across the sequential grid, optionally emit dx. HBM traffic =
  read x + read g (+ write dx).

Weights/biases live wholly in VMEM (<= 128x128 f32). Matmuls hit the
MXU with f32 accumulation (``preferred_element_type``); activations are
computed in the dtype of ``x`` (bf16 under mixed precision, matching
the Flax conv chains this replaces).

Replaces the reference's per-sample ``ConvChain(ksize=1)`` stacks
(reference support/networks.py:29-42 via sbmc.modules); numerics match
the unfused chain to bf16 rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wcmc_tpu.ops import pallas_kernels as _pk

_TILE_ROWS = 1024


def _act(name: str, z):
    if name == "relu":
        return jnp.maximum(z, 0.0)
    if name == "leaky_relu":
        return jnp.where(z >= 0, z, 0.01 * z)
    if name == "linear":
        return z
    raise ValueError(f"unsupported activation {name!r}")


def _act_grad(name: str, h, g):
    """Activation gradient expressed through the POST-activation value
    ``h`` (not the pre-activation): for relu/leaky_relu the sign of h
    carries the same information as the sign of z, and dropping z
    halves the backward kernel's VMEM (enabling larger row tiles)."""
    hf = h.astype(jnp.float32)  # Mosaic cannot cmpf packed bf16 vectors
    if name == "relu":
        return jnp.where(hf > 0, g, 0.0)
    if name == "leaky_relu":
        return jnp.where(hf >= 0, g, 0.01 * g)
    if name == "linear":
        return g
    raise ValueError(f"unsupported activation {name!r}")


# ---------------------------------------------------------------------------
# XLA reference implementation (any backend; also the numeric oracle)
# ---------------------------------------------------------------------------

def _mlp_xla(x, ws, bs, acts):
    h = x
    for w, b, a in zip(ws, bs, acts):
        z = jnp.dot(h, w.astype(h.dtype), preferred_element_type=jnp.float32)
        h = _act(a, z + b.astype(jnp.float32)).astype(x.dtype)
    return h


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, *refs, acts):
    n_layers = len(acts)
    out_ref = refs[-1]
    h = x_ref[...]
    for i in range(n_layers):
        w, b = refs[2 * i][...], refs[2 * i + 1][...]
        z = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        h = _act(acts[i], z).astype(x_ref.dtype)
    out_ref[...] = h


def _bwd_kernel(x_ref, g_ref, *refs, acts, compute_dx):
    """Recompute hiddens, backprop in VMEM, accumulate dW/db in f32.

    refs layout: [w_0, b_0, ..., w_{L-1}, b_{L-1},
                  (dx,)? dw_0, db_0, ..., dw_{L-1}, db_{L-1}]
    The dw/db output blocks are index-mapped to a constant block, so
    they stay resident in VMEM across the (sequential) row-tile grid
    and act as accumulators; they are zeroed on the first tile.
    """
    n_layers = len(acts)
    w_refs = [refs[2 * i] for i in range(n_layers)]
    b_refs = [refs[2 * i + 1] for i in range(n_layers)]
    out_refs = refs[2 * n_layers:]
    if compute_dx:
        dx_ref, out_refs = out_refs[0], out_refs[1:]
    dw_refs = [out_refs[2 * i] for i in range(n_layers)]
    db_refs = [out_refs[2 * i + 1] for i in range(n_layers)]

    first = pl.program_id(0) == 0

    # recompute forward; only post-activations are kept (bf16)
    hs = [x_ref[...]]
    for i in range(n_layers):
        z = jnp.dot(
            hs[-1], w_refs[i][...], preferred_element_type=jnp.float32
        ) + b_refs[i][...]
        hs.append(_act(acts[i], z).astype(x_ref.dtype))

    g = g_ref[...].astype(jnp.float32)
    for i in reversed(range(n_layers)):
        gz = _act_grad(acts[i], hs[i + 1], g)
        gz_c = gz.astype(x_ref.dtype)
        # dW_i = h_{i-1}^T gz  (contract over the row axis -> MXU)
        dw = jax.lax.dot_general(
            hs[i], gz_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db = jnp.sum(gz, axis=0, keepdims=True)

        @pl.when(first)
        def _init(i=i, dw=dw, db=db):
            dw_refs[i][...] = dw
            db_refs[i][...] = db

        @pl.when(jnp.logical_not(first))
        def _acc(i=i, dw=dw, db=db):
            dw_refs[i][...] += dw
            db_refs[i][...] += db

        if i > 0 or compute_dx:
            g = jax.lax.dot_general(
                gz_c, w_refs[i][...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    if compute_dx:
        dx_ref[...] = g.astype(dx_ref.dtype)


def _pad_rows_2d(x, n_pad):
    if x.shape[0] == n_pad:
        return x
    return jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _mlp_fwd_pallas(x, ws, bs, acts):
    n, c0 = x.shape
    tr = min(_TILE_ROWS, max(8, n))
    n_tiles = pl.cdiv(n, tr)
    n_pad = n_tiles * tr
    xp = _pad_rows_2d(x, n_pad)
    wcast = [w.astype(x.dtype) for w in ws]
    bcast = [b.reshape(1, -1).astype(jnp.float32) for b in bs]

    in_specs = [pl.BlockSpec((tr, c0), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for w, b in zip(wcast, bcast):
        in_specs += [_full_spec(w.shape), _full_spec(b.shape)]
    c_out = ws[-1].shape[1]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, acts=acts),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tr, c_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, c_out), x.dtype),
        interpret=_pk.INTERPRET,
    )(xp, *[t for pair in zip(wcast, bcast) for t in pair])
    return out[:n]


def _mlp_bwd_pallas(x, g, ws, bs, acts, compute_dx):
    n, c0 = x.shape
    tr = min(_TILE_ROWS, max(8, n))
    n_tiles = pl.cdiv(n, tr)
    n_pad = n_tiles * tr
    xp = _pad_rows_2d(x, n_pad)
    # zero-pad g too: padded rows then contribute 0 to dW/db
    gp = _pad_rows_2d(g.astype(x.dtype), n_pad)
    wcast = [w.astype(x.dtype) for w in ws]
    bcast = [b.reshape(1, -1).astype(jnp.float32) for b in bs]

    in_specs = [
        pl.BlockSpec((tr, c0), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, g.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    for w, b in zip(wcast, bcast):
        in_specs += [_full_spec(w.shape), _full_spec(b.shape)]

    out_specs = []
    out_shapes = []
    if compute_dx:
        out_specs.append(
            pl.BlockSpec((tr, c0), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct((n_pad, c0), x.dtype))
    for w, b in zip(ws, bs):
        out_specs += [_full_spec(w.shape), _full_spec((1, b.shape[-1]))]
        out_shapes += [
            jax.ShapeDtypeStruct(w.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, b.shape[-1]), jnp.float32),
        ]

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, acts=acts, compute_dx=compute_dx),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_pk.INTERPRET,
    )(xp, gp, *[t for pair in zip(wcast, bcast) for t in pair])

    idx = 0
    dx = None
    if compute_dx:
        dx = outs[0][:n]
        idx = 1
    dws = [outs[idx + 2 * i] for i in range(len(ws))]
    dbs = [outs[idx + 2 * i + 1].reshape(bs[i].shape)
           for i in range(len(ws))]
    return dx, dws, dbs


def _mlp_bwd_xla(x, g, ws, bs, acts, compute_dx):
    """Backward via jax.vjp over the XLA chain (CPU fallback)."""
    def f(x_, ws_, bs_):
        return _mlp_xla(x_, ws_, bs_, acts)

    _, vjp = jax.vjp(f, x, list(ws), list(bs))
    dx, dws, dbs = vjp(g.astype(x.dtype))
    return (dx if compute_dx else None), dws, dbs


# ---------------------------------------------------------------------------
# Public differentiable op
# ---------------------------------------------------------------------------

FORCE_PALLAS = False  # test hook: exercise the Pallas path in interpret mode


def _on_tpu():
    if FORCE_PALLAS:
        return True
    import importlib

    # NB: ``from wcmc_tpu.ops import kernel_apply`` resolves to the
    # re-exported FUNCTION of that name, not the submodule
    _ka = importlib.import_module("wcmc_tpu.ops.kernel_apply")
    return _ka._on_tpu()


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_mlp(x, ws, bs, acts, compute_dx=True):
    """y = act_L(...act_1(x W_1 + b_1)... W_L + b_L) over rows of x.

    Args:
      x: (N, C0) rows (flattened (B*S*H*W, C) pixel-sample features).
      ws: list of (C_{i-1}, C_i) weight matrices (f32 params).
      bs: list of (C_i,) biases.
      acts: tuple of activation names per layer ('relu'/'leaky_relu'/
        'linear'), length = len(ws).
      compute_dx: statically disable the dx output when x is data
        (saves the dx write + one matmul in the backward kernel).
    """
    if _on_tpu():
        return _mlp_fwd_pallas(x, list(ws), list(bs), tuple(acts))
    return _mlp_xla(x, list(ws), list(bs), tuple(acts))


def _fused_fwd(x, ws, bs, acts, compute_dx):
    return fused_mlp(x, ws, bs, acts, compute_dx), (x, list(ws), list(bs))


def _fused_bwd(acts, compute_dx, res, g):
    x, ws, bs = res
    if _on_tpu():
        dx, dws, dbs = _mlp_bwd_pallas(x, g, ws, bs, tuple(acts), compute_dx)
    else:
        dx, dws, dbs = _mlp_bwd_xla(x, g, ws, bs, tuple(acts), compute_dx)
    if not compute_dx:
        dx = jnp.zeros_like(x)
    return dx, dws, dbs


fused_mlp.defvjp(_fused_fwd, _fused_bwd)
