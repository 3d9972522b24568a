"""Pallas TPU kernels for per-pixel kernel application.

Performance model (v5e: ~820 GB/s HBM, 8x128 VPU): these ops are
bandwidth-bound on the K^2-channel weight tensor (arithmetic intensity
~0.75 flop/byte), so each kernel is designed to read/write the weight
tensor exactly once from HBM while the small radiance buffer
(C=3 x H x W, <=200 KB for a 128 training patch) stays resident in
VMEM across all row-tiles of an image.

Internal layout is channel-major (``C, H, W`` / ``K^2, h, w``) so the
vector unit operates on (rows=sublanes, width=lanes) tiles at full lane
occupancy; the public wrappers transpose from the framework's NHWC.

Scatter (splat) avoids overlapping-window reads of the big weight
tensor by factorizing into a row-aligned Pallas pass (x-direction taps,
reads weights once, emits a K-channel strip tensor ~14% the weight
size) plus a K-term y-shift reduction in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Test hook: run kernels in interpreter mode (CPU-correct).
INTERPRET = False

_DEF_TILE_ROWS = 16


def _tile_rows(h: int) -> int:
    # 16-row tiles satisfy both the f32 (8) and bf16 (16) sublane
    # granule for every block; smaller h falls back to the whole dim
    # (block == array dim is always legal).
    return min(_DEF_TILE_ROWS, h)


def _lane_pad(n: int) -> int:
    return -(-n // 128) * 128


def _scatter_tile_rows(h: int, w: int, ksize: int, c: int = 3) -> int:
    """Scatter throughput rises with tile height (larger tiles amortize
    grid overhead), bounded by VMEM: Pallas double-buffers EVERY block
    (x, w, and the K-strip output), and the lane (last) dim of each
    block is physically padded to a multiple of 128. v5e has 16 MiB of
    VMEM; budget 6 MiB per buffer set (x2 for double buffering = 12 MiB,
    leaving ~4 MiB of stack/scratch slack — round 1's 6 MiB-of-weights-
    only budget OOMed at 16.41 MiB scoped for the 108x108 K21 shape).

    Mosaic also requires the second-to-last block dim to be a multiple
    of the sublane granule (8 for f32, 16 for bf16 logits) or equal to
    the array dim, so the tile is rounded DOWN to a multiple of 16
    (floor 16) and clamped to h. A partial final tile (h % th != 0) is
    fine: the row pass is per-row aligned, so garbage reads past h only
    produce writes past h, which Pallas masks.
    """
    lanes_in = _lane_pad(w)
    lanes_out = _lane_pad(w + ksize - 1)
    per_row = 4 * (lanes_in * (c + ksize * ksize) + lanes_out * ksize * c)
    budget = 6 * 1024 * 1024
    th = budget // per_row
    if th < 16:
        # The minimum Mosaic-legal tile (16 rows for bf16 logits) would
        # double-buffer past VMEM; fail with a diagnosis instead of a
        # compile OOM.
        raise ValueError(
            f"scatter_tpu: width {w} with ksize {ksize} needs "
            f"{16 * per_row / 2**20:.1f} MiB per 16-row tile set "
            f"(budget {budget / 2**20:.0f} MiB); tile the width before "
            "calling (e.g. split the image into horizontal bands)"
        )
    return min(h, max(16, (int(th) // 16) * 16))


def _gather_wc(ow: int, ksize: int, w_itemsize: int) -> int:
    """Lane (column) tile width for the 2-D-tiled gather.  The VMEM
    bill per lane tile: the double-buffered K^2-weight block PLUS
    Mosaic's kernel stack, whose dominant term is the softmax/tap
    chain of per-channel (th, wc) f32 temporaries (~2 full f32 copies
    of the weight tile; measured: wc=256 at K=21 scoped 22.9 MiB).
    Pick the largest 128-multiple that keeps the sum under ~13 MiB."""
    budget = 13 * 1024 * 1024
    th = _DEF_TILE_ROWS
    for wc in (1024, 512, 256, 128):
        k2 = ksize * ksize
        need = 2 * k2 * th * wc * w_itemsize + 2 * k2 * th * wc * 4
        if wc <= _lane_pad(ow) and need <= budget:
            return wc
    return 128


def _to_cmajor(x):
    return jnp.transpose(x, (0, 3, 1, 2))


def _to_nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def _pad_rows(x, rows: int):
    """Zero-pad axis 2 (rows, channel-major layout) up to ``rows`` so
    in-kernel dynamic slices never clamp (a clamped start would
    misalign every row of the final partial tile)."""
    if x.shape[2] >= rows:
        return x
    pad = [(0, 0)] * x.ndim
    pad[2] = (0, rows - x.shape[2])
    return jnp.pad(x, pad)


# ---------------------------------------------------------------------------
# gather: out[p, c] = sum_d w[p, d] * buf[p + d, c]
# ---------------------------------------------------------------------------

def _softmax_stats(w_ref, ksize):
    """Per-pixel max and 1/sum(exp) over the K^2 channel dim of the
    (1, K^2, th, w) logits block — two passes, no scratch; the main tap
    loop then normalizes inline with exp(w - m) * inv.

    Logits may arrive bf16 (the conv computes bf16 anyway); all softmax
    math is f32 in-kernel (Mosaic cannot cmpf packed bf16 either)."""
    k2 = ksize * ksize
    m = w_ref[0, 0].astype(jnp.float32)
    for d in range(1, k2):
        m = jnp.maximum(m, w_ref[0, d].astype(jnp.float32))
    s = jnp.zeros(m.shape, jnp.float32)
    for d in range(k2):
        s = s + jnp.exp(w_ref[0, d].astype(jnp.float32) - m)
    return m, 1.0 / s


def _aligned_dy_slab(ref, i, tile_rows, dy):
    """Row slab [i*tile_rows + dy : +tile_rows] via an 8-aligned dynamic
    load plus a static sub-slice. Mosaic rejects dynamic sublane offsets
    that are not provably multiples of 8 once a row spans more than one
    128-lane tile (W > 128), so the unaligned part of the offset must be
    static.  (Used by the outer kernels, which keep the whole buffer
    VMEM-resident — they only run at training patch sizes; the gather
    below is fully 2-D tiled instead.)"""
    base, off = (dy // 8) * 8, dy % 8
    slab = ref[0, :, pl.ds(i * tile_rows + base, tile_rows + 8), :]
    return slab[:, off:off + tile_rows, :]


def _gather_kernel(*refs, ksize, tile_rows, wc, n_h8, softmax):
    """2-D-tiled gather: the buffer tile arrives as (1 + n_h8) x 2
    blocks (row main + 8-row halos, each with a 128-lane column halo);
    the kernel reassembles the (c, tile_rows + 8*n_h8, wc + 128) tile
    by static concatenation — row shifts then become static slices
    (Mosaic rejects unaligned dynamic sublane offsets once a row spans
    more than one 128-lane tile)."""
    n_buf = (1 + n_h8) * 2
    buf_refs, w_ref, out_ref = refs[:n_buf], refs[-2], refs[-1]
    left = jnp.concatenate([r[0] for r in buf_refs[:1 + n_h8]], axis=1)
    right = jnp.concatenate([r[0] for r in buf_refs[1 + n_h8:]], axis=1)
    full = jnp.concatenate([left, right], axis=2)
    c = full.shape[0]
    if softmax:
        m, inv = _softmax_stats(w_ref, ksize)
    acc = jnp.zeros((c, tile_rows, wc), jnp.float32)
    for dy in range(ksize):
        slab = full[:, dy:dy + tile_rows, :]
        for dx in range(ksize):
            tap = w_ref[0, dy * ksize + dx, :, :].astype(jnp.float32)
            if softmax:
                tap = jnp.exp(tap - m) * inv
            acc = acc + tap[None, :, :] * slab[:, :, dx:dx + wc]
    out_ref[0] = acc


def _pad_to(x, axis: int, size: int):
    if x.shape[axis] >= size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, size - x.shape[axis])
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("ksize", "softmax"))
def gather_tpu(buf, w, ksize, softmax=False):
    """buf (B,H,W,C), w (B,h,w,K^2) -> (B,h,w,C); h = H-K+1.

    With ``softmax`` the per-pixel K^2 softmax is computed in-kernel
    from logits ``w`` (the KPCN hot path), so the 146 MB probability
    tensor never exists in HBM.  Fully 2-D tiled: only (16, wc) weight
    tiles and small haloed buffer tiles are VMEM-resident, so any
    frame size that fits HBM is legal (full-width 1080p bands
    included); the dominant K^2 weight tensor is still read exactly
    once."""
    b, H, W, c = buf.shape
    h, ow = H - ksize + 1, W - ksize + 1
    assert h > 0 and ow > 0, (
        f"gather: buffer {H}x{W} smaller than kernel window {ksize}"
    )
    assert ksize <= 129, "column halo is a single 128-lane block"
    # th is always 16 (arrays are padded up for h < 16): the halo-row
    # blocks' index maps count in th//8 units, and 16 satisfies both
    # the f32 (8) and bf16 (16) sublane granule
    th = _DEF_TILE_ROWS
    wc = _gather_wc(ow, ksize, w.dtype.itemsize)
    n_row = -(-h // th)
    n_col = -(-ow // wc)
    n_h8 = -(-(ksize - 1) // 8)
    hp, wp = n_row * th, n_col * wc

    buf_t = _to_cmajor(buf).astype(jnp.float32)
    buf_t = _pad_to(_pad_to(buf_t, 2, hp + 8 * n_h8), 3, wp + 128)
    # logits stay in their dtype (bf16 on TPU): halves the HBM traffic
    # of the dominant K^2-channel tensor; softmax math is f32 in-kernel.
    # Padded rows/columns only affect padded pixels' own softmax
    # partitions (each pixel's softmax is private to its K^2 channels),
    # and those pixels are cropped below — no masking needed.
    w_t = _pad_to(_pad_to(_to_cmajor(w), 2, hp), 3, wp)

    q = wc // 128
    in_specs = []
    # row blocks x column blocks of the buffer tile (+halos)
    for r in range(1 + n_h8):
        rows = th if r == 0 else 8
        idx_r = (lambda bi, i, j, rr=r: (bi, 0, i, j)) if r == 0 else (
            lambda bi, i, j, rr=r: (bi, 0, (th // 8) * i + th // 8 + rr - 1, j)
        )
        in_specs.append(pl.BlockSpec(
            (1, c, rows, wc), idx_r, memory_space=pltpu.VMEM,
        ))
    for r in range(1 + n_h8):
        rows = th if r == 0 else 8
        if r == 0:
            idx = lambda bi, i, j: (bi, 0, i, q * j + q)
        else:
            idx = (lambda bi, i, j, rr=r:
                   (bi, 0, (th // 8) * i + th // 8 + rr - 1, q * j + q))
        in_specs.append(pl.BlockSpec(
            (1, c, rows, 128), idx, memory_space=pltpu.VMEM,
        ))
    in_specs.append(pl.BlockSpec(
        (1, ksize * ksize, th, wc), lambda bi, i, j: (bi, 0, i, j),
        memory_space=pltpu.VMEM,
    ))

    out = pl.pallas_call(
        functools.partial(
            _gather_kernel, ksize=ksize, tile_rows=th, wc=wc, n_h8=n_h8,
            softmax=softmax,
        ),
        grid=(b, n_row, n_col),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, c, th, wc),
                               lambda bi, i, j: (bi, 0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, hp, wp), jnp.float32),
        interpret=INTERPRET,
    )(*([buf_t] * (2 * (1 + n_h8))), w_t)
    return _to_nhwc(out[:, :, :h, :ow]).astype(buf.dtype)


# ---------------------------------------------------------------------------
# scatter (splat): out[q, c] = sum_d w[q - d, d] * x[q - d, c]
# ---------------------------------------------------------------------------

def _scatter_rows_kernel(x_ref, w_ref, s_ref, *, ksize, in_w,
                         softmax=False):
    """Row-aligned pass: s[dy, c, y, X] = sum_dx w[y, dy*K+dx] * x[y, X-dx]."""
    c = x_ref.shape[1]
    th = x_ref.shape[2]
    out_w = in_w + ksize - 1
    x_slab = x_ref[0]                     # (C, TH, in_w)
    if softmax:
        m, inv = _softmax_stats(w_ref, ksize)
    zero_pad = jnp.zeros((c, th, ksize - 1), jnp.float32)
    for dy in range(ksize):
        # Accumulate x-shifted taps; lane shifts are expressed as
        # concat-with-zeros (Mosaic has no scatter-add primitive).
        acc = jnp.zeros((c, th, out_w), jnp.float32)
        for dx in range(ksize):
            tap = w_ref[0, dy * ksize + dx, :, :].astype(jnp.float32)
            if softmax:
                tap = jnp.exp(tap - m) * inv
            contrib = tap[None, :, :] * x_slab          # (C, TH, in_w)
            parts = []
            if dx > 0:
                parts.append(zero_pad[:, :, :dx])
            parts.append(contrib)
            if dx < ksize - 1:
                parts.append(zero_pad[:, :, dx:])
            shifted = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=2)
            acc = acc + shifted
        s_ref[0, dy] = acc


@functools.partial(jax.jit, static_argnames=("ksize", "softmax"))
def scatter_tpu(x, w, ksize, softmax=False):
    """x (B,h,w,C), w (B,h,w,K^2) -> (B,H,W,C); H = h+K-1.

    ``softmax`` normalizes the K^2 logits per pixel in-kernel (used by
    the softmax-fused gather's buffer VJP)."""
    b, h, iw, c = x.shape
    H, W = h + ksize - 1, iw + ksize - 1
    th = _scatter_tile_rows(h, iw, ksize, c)
    assert th % 16 == 0 or th == h, (
        f"Mosaic-illegal scatter tile {th} for h={h}"
    )
    x_t = _to_cmajor(x).astype(jnp.float32)
    w_t = _to_cmajor(w)   # logits stay in their dtype (bf16 on TPU)

    s = pl.pallas_call(
        functools.partial(_scatter_rows_kernel, ksize=ksize, in_w=iw,
                          softmax=softmax),
        grid=(b, pl.cdiv(h, th)),
        in_specs=[
            pl.BlockSpec((1, c, th, iw), lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ksize * ksize, th, iw),
                         lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ksize, c, th, W),
                               lambda bi, i: (bi, 0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ksize, c, h, W), jnp.float32),
        interpret=INTERPRET,
    )(x_t, w_t)

    # y-direction reduction: out[Y] = sum_dy s[dy, Y - dy]
    out = jnp.zeros((b, c, H, W), jnp.float32)
    for dy in range(ksize):
        out = out.at[:, :, dy:dy + h, :].add(s[:, dy])
    return _to_nhwc(out).astype(x.dtype)


# ---------------------------------------------------------------------------
# outer: dw[p, d] = sum_c g[p, c] * buf[p + d, c]
# ---------------------------------------------------------------------------

def _outer_kernel(g_ref, buf_ref, dw_ref, *, ksize, tile_rows, out_w):
    i = pl.program_id(1)
    g_slab = g_ref[0, :, pl.ds(i * tile_rows, tile_rows), :out_w]  # (C,TH,ow)
    for dy in range(ksize):
        slab = _aligned_dy_slab(buf_ref, i, tile_rows, dy)
        for dx in range(ksize):
            prod = g_slab * slab[:, :, dx:dx + out_w]
            dw_ref[0, dy * ksize + dx] = jnp.sum(prod, axis=0)


def _outer_softmax_kernel(g_ref, buf_ref, w_ref, dw_ref, dp_scr, *, ksize,
                          tile_rows, out_w):
    """Fused (outer + softmax VJP): emits d(logits) directly.

    dp[d] = sum_c g * buf_{+d};  p = softmax(w);
    dlogits[d] = p[d] * (dp[d] - sum_e p[e] dp[e]).

    The raw dp values are staged in an f32 VMEM scratch during the
    first tap pass (the output block may be bf16 — staging there would
    round dp), then normalized in a second pass."""
    i = pl.program_id(1)
    g_slab = g_ref[0, :, pl.ds(i * tile_rows, tile_rows), :out_w]
    m, inv = _softmax_stats(w_ref, ksize)
    dot = jnp.zeros(m.shape, jnp.float32)
    for dy in range(ksize):
        slab = _aligned_dy_slab(buf_ref, i, tile_rows, dy)
        for dx in range(ksize):
            d = dy * ksize + dx
            dp = jnp.sum(g_slab * slab[:, :, dx:dx + out_w], axis=0)
            dp_scr[d] = dp
            dot = dot + jnp.exp(
                w_ref[0, d].astype(jnp.float32) - m
            ) * inv * dp
    for d in range(ksize * ksize):
        p_d = jnp.exp(w_ref[0, d].astype(jnp.float32) - m) * inv
        dw_ref[0, d] = (p_d * (dp_scr[d] - dot)).astype(dw_ref.dtype)


@functools.partial(jax.jit, static_argnames=("ksize",))
def outer_tpu(g, buf, ksize):
    """g (B,h,w,C), buf (B,H,W,C) -> (B,h,w,K^2)."""
    b, h, ow, c = g.shape
    H, W = buf.shape[1], buf.shape[2]
    th = _tile_rows(h)
    n_tiles = -(-h // th)
    hp = n_tiles * th
    Hp = hp + ((ksize - 1) // 8) * 8 + 8
    g_t = _pad_rows(_to_cmajor(g).astype(jnp.float32), hp)
    buf_t = _pad_rows(_to_cmajor(buf).astype(jnp.float32), Hp)

    dw = pl.pallas_call(
        functools.partial(_outer_kernel, ksize=ksize, tile_rows=th, out_w=ow),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, c, hp, ow), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, Hp, W), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ksize * ksize, th, ow),
                               lambda bi, i: (bi, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ksize * ksize, hp, ow),
                                       jnp.float32),
        interpret=INTERPRET,
    )(g_t, buf_t)
    return _to_nhwc(dw[:, :, :h]).astype(g.dtype)


@functools.partial(jax.jit, static_argnames=("ksize",))
def outer_softmax_tpu(g, buf, w, ksize):
    """Fused softmax-VJP outer: g (B,h,w,C), buf (B,H,W,C), logits
    w (B,h,w,K^2) -> d(logits) (B,h,w,K^2)."""
    b, h, ow, c = g.shape
    H, W = buf.shape[1], buf.shape[2]
    th = _tile_rows(h)
    n_tiles = -(-h // th)
    hp = n_tiles * th
    Hp = hp + ((ksize - 1) // 8) * 8 + 8
    g_t = _pad_rows(_to_cmajor(g).astype(jnp.float32), hp)
    buf_t = _pad_rows(_to_cmajor(buf).astype(jnp.float32), Hp)
    # logits stay in their dtype (bf16 on TPU); d(logits) is emitted in
    # the same dtype — it feeds the conv chain's (bf16) backward anyway
    w_t = _pad_rows(_to_cmajor(w), hp)

    dw = pl.pallas_call(
        functools.partial(_outer_softmax_kernel, ksize=ksize, tile_rows=th,
                          out_w=ow),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, c, hp, ow), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, Hp, W), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ksize * ksize, th, ow),
                         lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ksize * ksize, th, ow),
                               lambda bi, i: (bi, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ksize * ksize, hp, ow), w.dtype),
        scratch_shapes=[
            pltpu.VMEM((ksize * ksize, th, ow), jnp.float32),
        ],
        interpret=INTERPRET,
    )(g_t, buf_t, w_t)
    return _to_nhwc(dw[:, :, :h])
