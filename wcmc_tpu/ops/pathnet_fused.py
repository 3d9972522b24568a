"""PathNet-shaped fused Pallas kernels: embedding (+ fused sample-mean)
and head (+ broadcast context, no materialized concat).

These specialize ops/mlp_fused.py to PathNet's dataflow (reference
support/networks.py:29-42):

  e    = MLP_embed(paths)                  # per (sample, pixel) row
  ctx  = UNet(mean_S(e))                   # stays in XLA (spatial 3x3)
  out  = MLP_head(concat(e, broadcast_S(ctx)))

As plain XLA + generic fused MLPs, three glue tensors round-trip HBM
per branch: the f32 convert feeding the mean, the (B*S*HW, 128) concat,
and its backward slice/add. The kernels here absorb all three:

* ``pathnet_embed``: one pass over paths; writes the bf16 embedding AND
  its f32 sample-mean (accumulated across the S grid axis in VMEM).
* ``pathnet_head``: reads e and the (B, HW, C) context with a
  broadcast index map (the context block is fetched once per row-tile
  and reused across all S samples); layer 1 computes
  e @ W1[:C] + ctx @ W1[C:] so the concat never exists. Emits f32.

Backward passes recompute hiddens from inputs (rematerialization) and
accumulate dW/db (and d(ctx), which sums over S) in f32 across the
sequential grid. Gradients w.r.t. paths are not computed (paths are
data).

Grid order is (B, row-tiles, S) — S innermost — so accumulator blocks
(mean, dctx) are revisited on adjacent grid steps, which is what makes
the in-VMEM accumulation legal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wcmc_tpu.ops import pallas_kernels as _pk
from wcmc_tpu.ops.mlp_fused import _act, _act_grad, _mlp_xla

_EMBED_TILE = 4096
_HEAD_TILE = 2048


def _full(shape):
    return pl.BlockSpec(shape, lambda b, t, s: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _pad_rows(x, rows):
    """Pad axis -2 (rows within an image) up to ``rows``."""
    if x.shape[-2] == rows:
        return x
    pad = [(0, 0)] * x.ndim
    pad[-2] = (0, rows - x.shape[-2])
    return jnp.pad(x, pad)


# ---------------------------------------------------------------------------
# embedding (+ sample mean)
# ---------------------------------------------------------------------------

def _embed_fwd_kernel(x_ref, *refs, acts, n_samples):
    n_layers = len(acts)
    e_ref, mean_ref = refs[-2], refs[-1]
    h = x_ref[0, 0]
    for i in range(n_layers):
        w, b = refs[2 * i][...], refs[2 * i + 1][...]
        h = _act(acts[i], jnp.dot(
            h, w, preferred_element_type=jnp.float32) + b
        ).astype(x_ref.dtype)
    e_ref[0, 0] = h
    si = pl.program_id(2)
    contrib = h.astype(jnp.float32) * (1.0 / n_samples)

    @pl.when(si == 0)
    def _init():
        mean_ref[0] = contrib

    @pl.when(si != 0)
    def _acc():
        mean_ref[0] += contrib


def _embed_bwd_kernel(x_ref, ge_ref, gm_ref, *refs, acts, n_samples,
                      compute_dx):
    n_layers = len(acts)
    w_refs = [refs[2 * i] for i in range(n_layers)]
    b_refs = [refs[2 * i + 1] for i in range(n_layers)]
    outs = refs[2 * n_layers:]
    dx_ref = None
    if compute_dx:
        dx_ref, outs = outs[0], outs[1:]
    dw_refs = [outs[2 * i] for i in range(n_layers)]
    db_refs = [outs[2 * i + 1] for i in range(n_layers)]
    first = jnp.logical_and(
        pl.program_id(0) == 0,
        jnp.logical_and(pl.program_id(1) == 0, pl.program_id(2) == 0),
    )

    hs = [x_ref[0, 0]]
    for i in range(n_layers):
        z = jnp.dot(
            hs[-1], w_refs[i][...], preferred_element_type=jnp.float32
        ) + b_refs[i][...]
        hs.append(_act(acts[i], z).astype(x_ref.dtype))

    # d(e) plus the mean path: mean = sum_s e / S
    g = ge_ref[0, 0].astype(jnp.float32) + gm_ref[0] * (1.0 / n_samples)
    for i in reversed(range(n_layers)):
        gz = _act_grad(acts[i], hs[i + 1], g)
        gz_c = gz.astype(x_ref.dtype)
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
        dx_ref[0, 0] = g.astype(dx_ref.dtype)


def _embed_geometry(x, compute_dx=False):
    b, s, hw, c0 = x.shape
    # compute_dx adds a (tr, c0) output block plus the in-kernel
    # backprop chain to dx — at tr 4096 the bwd kernel's scoped VMEM
    # stack measures 17.06M vs the 16M limit (Multisteps at
    # (4, 8, 12288, 90), r4 sample-space OOM). Halving the row tile
    # only on that path keeps the KPCN flagship (compute_dx=False)
    # at its measured-optimal 4096.
    cap = _EMBED_TILE // 2 if compute_dx else _EMBED_TILE
    tr = min(cap, max(8, hw))
    n_tiles = pl.cdiv(hw, tr)
    return b, s, hw, c0, tr, n_tiles, n_tiles * tr


def _embed_fwd_pallas(x, ws, bs, acts):
    b, s, hw, c0, tr, n_tiles, hwp = _embed_geometry(x)
    xp = _pad_rows(x, hwp)
    wcast = [w.astype(x.dtype) for w in ws]
    bcast = [bb.reshape(1, -1).astype(jnp.float32) for bb in bs]
    c_out = ws[-1].shape[1]

    in_specs = [pl.BlockSpec((1, 1, tr, c0),
                             lambda bi, ti, si: (bi, si, ti, 0),
                             memory_space=pltpu.VMEM)]
    for w, bb in zip(wcast, bcast):
        in_specs += [_full(w.shape), _full(bb.shape)]

    e, mean = pl.pallas_call(
        functools.partial(_embed_fwd_kernel, acts=acts, n_samples=s),
        grid=(b, n_tiles, s),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, tr, c_out),
                         lambda bi, ti, si: (bi, si, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, c_out), lambda bi, ti, si: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, hwp, c_out), x.dtype),
            jax.ShapeDtypeStruct((b, hwp, c_out), jnp.float32),
        ],
        interpret=_pk.INTERPRET,
    )(xp, *[t for pair in zip(wcast, bcast) for t in pair])
    return e[:, :, :hw], mean[:, :hw]


def _embed_bwd_pallas(x, ge, gmean, ws, bs, acts, compute_dx):
    b, s, hw, c0, tr, n_tiles, hwp = _embed_geometry(x, compute_dx)
    xp = _pad_rows(x, hwp)
    gep = _pad_rows(ge.astype(x.dtype), hwp)
    gmp = _pad_rows(gmean.astype(jnp.float32), hwp)
    wcast = [w.astype(x.dtype) for w in ws]
    bcast = [bb.reshape(1, -1).astype(jnp.float32) for bb in bs]
    c_out = ws[-1].shape[1]

    in_specs = [
        pl.BlockSpec((1, 1, tr, c0), lambda bi, ti, si: (bi, si, ti, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tr, c_out), lambda bi, ti, si: (bi, si, ti, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tr, c_out), lambda bi, ti, si: (bi, ti, 0),
                     memory_space=pltpu.VMEM),
    ]
    for w, bb in zip(wcast, bcast):
        in_specs += [_full(w.shape), _full(bb.shape)]

    out_specs, out_shapes = [], []
    if compute_dx:
        out_specs.append(
            pl.BlockSpec((1, 1, tr, c0), lambda bi, ti, si: (bi, si, ti, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct((b, s, hwp, c0), x.dtype))
    for w, bb in zip(ws, bs):
        out_specs += [_full(w.shape), _full((1, bb.shape[-1]))]
        out_shapes += [
            jax.ShapeDtypeStruct(w.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, bb.shape[-1]), jnp.float32),
        ]

    outs = pl.pallas_call(
        functools.partial(_embed_bwd_kernel, acts=acts, n_samples=s,
                          compute_dx=compute_dx),
        grid=(b, n_tiles, s),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_pk.INTERPRET,
    )(xp, gep, gmp, *[t for pair in zip(wcast, bcast) for t in pair])
    dx = None
    if compute_dx:
        dx = outs[0][:, :, :hw]
        outs = outs[1:]
    dws = [outs[2 * i] for i in range(len(ws))]
    dbs = [outs[2 * i + 1].reshape(bs[i].shape) for i in range(len(ws))]
    return dx, dws, dbs


def _embed_xla(x, ws, bs, acts):
    b, s, hw, c0 = x.shape
    e = _mlp_xla(x.reshape(-1, c0), list(ws), list(bs), acts)
    e = e.reshape(b, s, hw, ws[-1].shape[1])
    return e, jnp.mean(e.astype(jnp.float32), axis=1)


def _on_tpu():
    import importlib

    if importlib.import_module("wcmc_tpu.ops.mlp_fused").FORCE_PALLAS:
        return True
    return importlib.import_module("wcmc_tpu.ops.kernel_apply")._on_tpu()


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pathnet_embed(x, ws, bs, acts, compute_dx=False):
    """(B, S, HW, C0) rows -> (e (B,S,HW,Cout) in x.dtype,
    mean_S(e) (B,HW,Cout) f32).

    ``compute_dx=False`` (the KPCN PathNet case: raw path descriptors
    are data) skips the d(input) output in the backward kernel; it MUST
    be True whenever the input carries gradients — e.g. SBMC/LBMC
    features that embed the learned p-buffer under use_llpm_buf."""
    if _on_tpu():
        return _embed_fwd_pallas(x, list(ws), list(bs), tuple(acts))
    return _embed_xla(x, ws, bs, tuple(acts))


def _pe_fwd(x, ws, bs, acts, compute_dx):
    return pathnet_embed(x, ws, bs, acts, compute_dx), (x, list(ws), list(bs))


def _pe_bwd(acts, compute_dx, res, gs):
    x, ws, bs = res
    ge, gmean = gs
    if _on_tpu():
        dx, dws, dbs = _embed_bwd_pallas(x, ge, gmean, ws, bs, tuple(acts),
                                         compute_dx)
    else:
        def f(x_, ws_, bs_):
            return _embed_xla(x_, ws_, bs_, tuple(acts))

        _, vjp = jax.vjp(f, x, ws, bs)
        dx, dws, dbs = vjp((ge, gmean))
        if not compute_dx:
            dx = None
    if dx is None:
        dx = jnp.zeros_like(x)
    return dx, dws, dbs


pathnet_embed.defvjp(_pe_fwd, _pe_bwd)


# ---------------------------------------------------------------------------
# head (broadcast context, fused concat)
# ---------------------------------------------------------------------------

def _head_fwd_kernel(e_ref, ctx_ref, w1e_ref, w1c_ref, b1_ref, *refs,
                     acts, moments, cmajor=False):
    n_out = 3 if moments else 1
    out_refs = refs[len(refs) - n_out:]
    rest = refs[:len(refs) - n_out]
    z = jnp.dot(e_ref[0, 0], w1e_ref[...],
                preferred_element_type=jnp.float32)
    z += jnp.dot(ctx_ref[0], w1c_ref[...],
                 preferred_element_type=jnp.float32)
    h_f32 = _act(acts[0], z + b1_ref[...])
    h = h_f32.astype(e_ref.dtype)
    for i in range(len(acts) - 1):
        w, b = rest[2 * i][...], rest[2 * i + 1][...]
        z = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        h_f32 = _act(acts[i + 1], z)
        h = h_f32.astype(e_ref.dtype)
    if cmajor:
        # emit (C, rows): a C-minor f32 output with 3-6 channels would
        # physically pad each row to 128 lanes in HBM (~21x blowup at
        # the KPCN p-buffer shape); the in-VMEM transpose is ~free
        out_refs[0][0, 0] = jnp.transpose(
            h_f32.astype(out_refs[0].dtype), (1, 0)
        )
    else:
        out_refs[0][0, 0] = h_f32.astype(out_refs[0].dtype)
    if moments:
        # running sum / sum-of-squares over the S grid axis (innermost,
        # so the accumulator block is revisited on adjacent steps) —
        # feeds the KPCN inputs' p-buffer mean and variance without an
        # XLA reduce over the (B,S,H,W,C) tensor
        si = pl.program_id(2)
        sq = h_f32 * h_f32

        @pl.when(si == 0)
        def _init():
            out_refs[1][0] = h_f32
            out_refs[2][0] = sq

        @pl.when(si != 0)
        def _acc():
            out_refs[1][0] += h_f32
            out_refs[2][0] += sq


def _head_bwd_kernel(e_ref, ctx_ref, g_ref, *all_refs, acts, moments,
                     cmajor=False):
    n_rest = len(acts) - 1
    if moments:
        gsum_ref, gsq_ref = all_refs[0], all_refs[1]
        all_refs = all_refs[2:]
    w1e_ref, w1c_ref, b1_ref = all_refs[:3]
    refs = all_refs[3:]
    w_refs = [refs[2 * i] for i in range(n_rest)]
    b_refs = [refs[2 * i + 1] for i in range(n_rest)]
    outs = refs[2 * n_rest:]
    (de_ref, dctx_ref, dw1e_ref, dw1c_ref, db1_ref) = outs[:5]
    dw_refs = [outs[5 + 2 * i] for i in range(n_rest)]
    db_refs = [outs[5 + 2 * i + 1] for i in range(n_rest)]

    si = pl.program_id(2)
    first = jnp.logical_and(
        pl.program_id(0) == 0, jnp.logical_and(pl.program_id(1) == 0,
                                               si == 0),
    )

    e = e_ref[0, 0]
    ctx = ctx_ref[0].astype(e.dtype)
    z1 = jnp.dot(e, w1e_ref[...], preferred_element_type=jnp.float32)
    z1 += jnp.dot(ctx, w1c_ref[...], preferred_element_type=jnp.float32)
    h_f32 = _act(acts[0], z1 + b1_ref[...])
    hs = [h_f32.astype(e.dtype)]
    for i in range(n_rest):
        z = jnp.dot(hs[-1], w_refs[i][...],
                    preferred_element_type=jnp.float32) + b_refs[i][...]
        h_f32 = _act(acts[i + 1], z)
        hs.append(h_f32.astype(e.dtype))

    g = g_ref[0, 0].astype(jnp.float32)
    if cmajor:
        g = jnp.transpose(g, (1, 0))      # (C, rows) -> (rows, C)
    if moments:
        # out = h_f32 (recomputed); sum/sumsq cotangents broadcast over S
        g = g + gsum_ref[0] + 2.0 * h_f32 * gsq_ref[0]
    for i in reversed(range(n_rest)):
        gz = _act_grad(acts[i + 1], hs[i + 1], g)
        gz_c = gz.astype(e.dtype)
        dw = jax.lax.dot_general(
            hs[i], gz_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db = jnp.sum(gz, axis=0, keepdims=True)

        @pl.when(first)
        def _i(i=i, dw=dw, db=db):
            dw_refs[i][...] = dw
            db_refs[i][...] = db

        @pl.when(jnp.logical_not(first))
        def _a(i=i, dw=dw, db=db):
            dw_refs[i][...] += dw
            db_refs[i][...] += db

        g = jax.lax.dot_general(
            gz_c, w_refs[i][...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    g1 = _act_grad(acts[0], hs[0], g)
    g1_c = g1.astype(e.dtype)
    dw1e = jax.lax.dot_general(e, g1_c, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dw1c = jax.lax.dot_general(ctx, g1_c, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    db1 = jnp.sum(g1, axis=0, keepdims=True)

    @pl.when(first)
    def _i1():
        dw1e_ref[...] = dw1e
        dw1c_ref[...] = dw1c
        db1_ref[...] = db1

    @pl.when(jnp.logical_not(first))
    def _a1():
        dw1e_ref[...] += dw1e
        dw1c_ref[...] += dw1c
        db1_ref[...] += db1

    de_ref[0, 0] = jax.lax.dot_general(
        g1_c, w1e_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(de_ref.dtype)

    dctx = jax.lax.dot_general(
        g1_c, w1c_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(si == 0)
    def _ic():
        dctx_ref[0] = dctx

    @pl.when(si != 0)
    def _ac():
        dctx_ref[0] += dctx


def _head_geometry(e):
    b, s, hw, ce = e.shape
    tr = min(_HEAD_TILE, max(8, hw))
    n_tiles = pl.cdiv(hw, tr)
    return b, s, hw, ce, tr, n_tiles, n_tiles * tr


def _head_split_w1(ws, ce):
    w1 = ws[0]
    return w1[:ce], w1[ce:]


def _head_fwd_pallas(e, ctx, ws, bs, acts, moments, out_dtype, cmajor):
    b, s, hw, ce, tr, n_tiles, hwp = _head_geometry(e)
    ep = _pad_rows(e, hwp)
    ctxp = _pad_rows(ctx, hwp).astype(e.dtype)
    w1e, w1c = _head_split_w1(ws, ce)
    wcast = [w.astype(e.dtype) for w in ws[1:]]
    bcast = [bb.reshape(1, -1).astype(jnp.float32) for bb in bs]
    c_out = ws[-1].shape[1]

    in_specs = [
        pl.BlockSpec((1, 1, tr, ce), lambda bi, ti, si: (bi, si, ti, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tr, ctx.shape[-1]),
                     lambda bi, ti, si: (bi, ti, 0),
                     memory_space=pltpu.VMEM),
        _full(w1e.shape), _full(w1c.shape), _full(bcast[0].shape),
    ]
    for w, bb in zip(wcast, bcast[1:]):
        in_specs += [_full(w.shape), _full(bb.shape)]

    if cmajor:
        out_specs = [pl.BlockSpec((1, 1, c_out, tr),
                                  lambda bi, ti, si: (bi, si, 0, ti),
                                  memory_space=pltpu.VMEM)]
        out_shapes = [jax.ShapeDtypeStruct((b, s, c_out, hwp), out_dtype)]
    else:
        out_specs = [pl.BlockSpec((1, 1, tr, c_out),
                                  lambda bi, ti, si: (bi, si, ti, 0),
                                  memory_space=pltpu.VMEM)]
        out_shapes = [jax.ShapeDtypeStruct((b, s, hwp, c_out), out_dtype)]
    if moments:
        mom_spec = pl.BlockSpec((1, tr, c_out),
                                lambda bi, ti, si: (bi, ti, 0),
                                memory_space=pltpu.VMEM)
        out_specs += [mom_spec, mom_spec]
        out_shapes += [jax.ShapeDtypeStruct((b, hwp, c_out), jnp.float32)] * 2

    outs = pl.pallas_call(
        functools.partial(_head_fwd_kernel, acts=acts, moments=moments,
                          cmajor=cmajor),
        grid=(b, n_tiles, s),
        in_specs=in_specs,
        out_specs=out_specs if moments else out_specs[0],
        out_shape=out_shapes if moments else out_shapes[0],
        interpret=_pk.INTERPRET,
    )(ep, ctxp, w1e.astype(e.dtype), w1c.astype(e.dtype), bcast[0],
      *[t for pair in zip(wcast, bcast[1:]) for t in pair])
    if moments:
        out, ssum, ssq = outs
        out = out[..., :hw] if cmajor else out[:, :, :hw]
        return out, ssum[:, :hw], ssq[:, :hw]
    return outs[..., :hw] if cmajor else outs[:, :, :hw]


def _head_bwd_pallas(e, ctx, g, gsum, gsq, ws, bs, acts, moments,
                     cmajor=False):
    b, s, hw, ce, tr, n_tiles, hwp = _head_geometry(e)
    ep = _pad_rows(e, hwp)
    ctxp = _pad_rows(ctx, hwp)
    if cmajor:  # g (B, S, C, HW): rows are the minor axis
        gp = g.astype(jnp.float32)
        if gp.shape[-1] != hwp:
            gp = jnp.pad(gp, [(0, 0)] * 3 + [(0, hwp - gp.shape[-1])])
        c_g = g.shape[2]
        g_spec = pl.BlockSpec((1, 1, c_g, tr),
                              lambda bi, ti, si: (bi, si, 0, ti),
                              memory_space=pltpu.VMEM)
    else:
        gp = _pad_rows(g.astype(jnp.float32), hwp)
        g_spec = pl.BlockSpec((1, 1, tr, g.shape[-1]),
                              lambda bi, ti, si: (bi, si, ti, 0),
                              memory_space=pltpu.VMEM)
    w1e, w1c = _head_split_w1(ws, ce)
    wcast = [w.astype(e.dtype) for w in ws[1:]]
    bcast = [bb.reshape(1, -1).astype(jnp.float32) for bb in bs]

    in_specs = [
        pl.BlockSpec((1, 1, tr, ce), lambda bi, ti, si: (bi, si, ti, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tr, ctx.shape[-1]),
                     lambda bi, ti, si: (bi, ti, 0),
                     memory_space=pltpu.VMEM),
        g_spec,
    ]
    mom_args = ()
    if moments:
        c_out = ws[-1].shape[1]
        mom_spec = pl.BlockSpec((1, tr, c_out),
                                lambda bi, ti, si: (bi, ti, 0),
                                memory_space=pltpu.VMEM)
        in_specs += [mom_spec, mom_spec]
        mom_args = (
            _pad_rows(gsum.astype(jnp.float32), hwp),
            _pad_rows(gsq.astype(jnp.float32), hwp),
        )
    in_specs += [_full(w1e.shape), _full(w1c.shape), _full(bcast[0].shape)]
    for w, bb in zip(wcast, bcast[1:]):
        in_specs += [_full(w.shape), _full(bb.shape)]

    out_specs = [
        pl.BlockSpec((1, 1, tr, ce), lambda bi, ti, si: (bi, si, ti, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tr, ctx.shape[-1]),
                     lambda bi, ti, si: (bi, ti, 0),
                     memory_space=pltpu.VMEM),
        _full(w1e.shape), _full(w1c.shape), _full((1, bs[0].shape[-1])),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((b, s, hwp, ce), e.dtype),
        jax.ShapeDtypeStruct((b, hwp, ctx.shape[-1]), jnp.float32),
        jax.ShapeDtypeStruct(w1e.shape, jnp.float32),
        jax.ShapeDtypeStruct(w1c.shape, jnp.float32),
        jax.ShapeDtypeStruct((1, bs[0].shape[-1]), jnp.float32),
    ]
    for w, bb in zip(ws[1:], bs[1:]):
        out_specs += [_full(w.shape), _full((1, bb.shape[-1]))]
        out_shapes += [
            jax.ShapeDtypeStruct(w.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, bb.shape[-1]), jnp.float32),
        ]

    outs = pl.pallas_call(
        functools.partial(_head_bwd_kernel, acts=acts, moments=moments,
                          cmajor=cmajor),
        grid=(b, n_tiles, s),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_pk.INTERPRET,
    )(ep, ctxp, gp, *mom_args,
      w1e.astype(e.dtype), w1c.astype(e.dtype), bcast[0],
      *[t for pair in zip(wcast, bcast[1:]) for t in pair])

    de = outs[0][:, :, :hw]
    dctx = outs[1][:, :hw]
    dw1 = jnp.concatenate([outs[2], outs[3]], axis=0)
    dws = [dw1] + [outs[5 + 2 * i] for i in range(len(ws) - 1)]
    dbs = [outs[4].reshape(bs[0].shape)] + [
        outs[5 + 2 * i + 1].reshape(bs[i + 1].shape)
        for i in range(len(ws) - 1)
    ]
    return de, dctx, dws, dbs


def _head_xla(e, ctx, ws, bs, acts, moments=False, out_dtype=jnp.float32,
              cmajor=False):
    b, s, hw, ce = e.shape
    joint = jnp.concatenate(
        [e, jnp.broadcast_to(
            ctx[:, None].astype(e.dtype), (b, s, hw, ctx.shape[-1])
        )],
        axis=-1,
    )
    out = _mlp_xla(joint.reshape(-1, joint.shape[-1]), list(ws), list(bs),
                   acts)
    out = out.reshape(b, s, hw, ws[-1].shape[1]).astype(out_dtype)
    res = jnp.transpose(out, (0, 1, 3, 2)) if cmajor else out
    if moments:
        out32 = out.astype(jnp.float32)
        return res, jnp.sum(out32, axis=1), jnp.sum(out32 * out32, axis=1)
    return res


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def pathnet_head(e, ctx, ws, bs, acts, moments=False, out_dtype=jnp.float32,
                 cmajor=False):
    """Head chain over [e | broadcast_S(ctx)] without materializing the
    concat. e (B,S,HW,Ce) in compute dtype; ctx (B,HW,Cc) f32;
    ws[0] has shape (Ce+Cc, C1). Returns (B,S,HW,Cout) f32, or with
    ``moments`` a tuple (out, sum_S(out), sum_S(out^2)) where the f32
    moments are accumulated in VMEM (feeds the KPCN inputs' p-buffer
    mean/variance without an XLA reduce over the sample axis).

    ``cmajor``: emit the per-sample output as (B, S, Cout, HW) — the
    dense layout for the manifold-loss path (see losses._prep_pair);
    moments stay (B, HW, Cout)."""
    if _on_tpu():
        return _head_fwd_pallas(e, ctx, list(ws), list(bs), tuple(acts),
                                moments, out_dtype, cmajor)
    return _head_xla(e, ctx, ws, bs, tuple(acts), moments, out_dtype, cmajor)


def _ph_fwd(e, ctx, ws, bs, acts, moments, out_dtype, cmajor):
    out = pathnet_head(e, ctx, ws, bs, acts, moments, out_dtype, cmajor)
    return out, (e, ctx, list(ws), list(bs))


def _ph_bwd(acts, moments, out_dtype, cmajor, res, g):
    e, ctx, ws, bs = res
    if moments:
        g_out, g_sum, g_sq = g
    else:
        g_out, g_sum, g_sq = g, None, None
    if _on_tpu():
        de, dctx, dws, dbs = _head_bwd_pallas(
            e, ctx, g_out, g_sum, g_sq, ws, bs, tuple(acts), moments,
            cmajor,
        )
    else:
        def f(e_, ctx_, ws_, bs_):
            return _head_xla(e_, ctx_, ws_, bs_, tuple(acts), moments,
                             out_dtype, cmajor)

        _, vjp = jax.vjp(f, e, ctx, ws, bs)
        de, dctx, dws, dbs = vjp(g)
    return de, dctx, dws, dbs


pathnet_head.defvjp(_ph_fwd, _ph_bwd)
