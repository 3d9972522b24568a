"""Kernel-apply / splat ops: XLA reference vs brute force, VJPs, and
Pallas kernels in interpreter mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import importlib

ka = importlib.import_module("wcmc_tpu.ops.kernel_apply")
pk = importlib.import_module("wcmc_tpu.ops.pallas_kernels")
from wcmc_tpu.ops.splat import kernel_splat, splat_normalized

K = 5


def brute_gather(buf, w, k):
    b, H, W, c = buf.shape
    h, ow = H - k + 1, W - k + 1
    out = np.zeros((b, h, ow, c), np.float32)
    for bi in range(b):
        for y in range(h):
            for x in range(ow):
                for dy in range(k):
                    for dx in range(k):
                        out[bi, y, x] += (
                            w[bi, y, x, dy * k + dx] * buf[bi, y + dy, x + dx]
                        )
    return out


def brute_scatter(xv, w, k):
    b, h, ow, c = xv.shape
    H, W = h + k - 1, ow + k - 1
    out = np.zeros((b, H, W, c), np.float32)
    for bi in range(b):
        for y in range(h):
            for x in range(ow):
                for dy in range(k):
                    for dx in range(k):
                        out[bi, y + dy, x + dx] += (
                            w[bi, y, x, dy * k + dx] * xv[bi, y, x]
                        )
    return out


@pytest.fixture(scope="module")
def data(rng):
    b, H, W, c = 2, 12, 11, 3
    h, ow = H - K + 1, W - K + 1
    buf = rng.standard_normal((b, H, W, c)).astype(np.float32)
    w = rng.standard_normal((b, h, ow, K * K)).astype(np.float32)
    x = rng.standard_normal((b, h, ow, c)).astype(np.float32)
    return buf, w, x


def test_gather_xla_matches_brute(data):
    buf, w, _ = data
    out = np.asarray(ka._gather_xla(jnp.asarray(buf), jnp.asarray(w), K))
    np.testing.assert_allclose(out, brute_gather(buf, w, K), rtol=1e-4, atol=1e-4)


def test_scatter_xla_matches_brute(data):
    buf, w, x = data
    out = np.asarray(ka._scatter_xla(jnp.asarray(x), jnp.asarray(w), K))
    np.testing.assert_allclose(out, brute_scatter(x, w, K), rtol=1e-4, atol=1e-4)


def test_gather_scatter_adjoint(data):
    """<gather(buf, w), g> == <buf, scatter(g, w)> — the defining
    adjoint identity behind the custom VJPs."""
    buf, w, x = data
    g = np.random.default_rng(0).standard_normal(x.shape).astype(np.float32)
    lhs = np.sum(np.asarray(ka._gather_xla(jnp.asarray(buf), jnp.asarray(w), K)) * g)
    rhs = np.sum(np.asarray(ka._scatter_xla(jnp.asarray(g), jnp.asarray(w), K)) * buf)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_gather_custom_vjp_matches_autodiff(data):
    buf, w, _ = data
    bufj, wj = jnp.asarray(buf), jnp.asarray(w)

    def f_custom(b_, w_):
        return jnp.sum(ka.kernel_gather(b_, w_, K) ** 2)

    def f_auto(b_, w_):
        return jnp.sum(ka._gather_xla(b_, w_, K) ** 2)

    g1 = jax.grad(f_custom, argnums=(0, 1))(bufj, wj)
    g2 = jax.grad(f_auto, argnums=(0, 1))(bufj, wj)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), rtol=1e-3, atol=1e-4)


def test_scatter_custom_vjp_matches_autodiff(data):
    _, w, x = data
    xj, wj = jnp.asarray(x), jnp.asarray(w)

    def f_custom(x_, w_):
        return jnp.sum(ka.kernel_scatter(x_, w_, K) ** 2)

    def f_auto(x_, w_):
        return jnp.sum(ka._scatter_xla(x_, w_, K) ** 2)

    g1 = jax.grad(f_custom, argnums=(0, 1))(xj, wj)
    g2 = jax.grad(f_auto, argnums=(0, 1))(xj, wj)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), rtol=1e-3, atol=1e-4)


def test_kernel_apply_softmax_partition_of_unity(data):
    """With softmax kernels, applying to a constant buffer returns the
    constant (weights sum to 1)."""
    buf, w, _ = data
    const = jnp.ones_like(jnp.asarray(buf)) * 2.5
    out = ka.kernel_apply(const, jnp.asarray(w), K, softmax=True)
    np.testing.assert_allclose(np.asarray(out), 2.5, rtol=1e-5)


def test_splat_normalized_constant_preservation(rng):
    """Weight-normalized splat of a constant field returns the constant."""
    b, s, h, w = 1, 3, 10, 10
    vals = jnp.ones((b, s, h, w, 3)) * 4.0
    weights = jnp.asarray(
        rng.random((b, s, h, w, K * K)).astype(np.float32) + 0.1
    )
    out = splat_normalized(vals, weights, K)
    np.testing.assert_allclose(np.asarray(out), 4.0, rtol=1e-4)


def test_splat_normalized_logits_matches_naive_exp(rng):
    """At moderate logits the stabilized splat equals the naive
    exp-then-normalize computation, values AND gradients (the per-pixel
    shift cancels exactly in the ratio)."""
    from wcmc_tpu.ops.splat import splat_normalized_logits

    b, s, h, w = 1, 2, 9, 9
    vals = jnp.asarray(rng.random((b, s, h, w, 3)).astype(np.float32))
    logits = jnp.asarray(
        (2.0 * rng.standard_normal((b, s, h, w, K * K))).astype(np.float32)
    )

    def f_stab(lg):
        return splat_normalized_logits(vals, lg, K)

    def f_naive(lg):
        return splat_normalized(vals, jnp.exp(lg), K)

    np.testing.assert_allclose(np.asarray(f_stab(logits)),
                               np.asarray(f_naive(logits)),
                               rtol=1e-4, atol=1e-5)
    g1 = jax.grad(lambda lg: jnp.sum(f_stab(lg) ** 2))(logits)
    g2 = jax.grad(lambda lg: jnp.sum(f_naive(lg) ** 2))(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-5)


def test_splat_normalized_logits_shift_invariant(rng):
    """Adding any constant to every logit leaves the normalized output
    exactly unchanged (only weight ratios reach the output)."""
    from wcmc_tpu.ops.splat import splat_normalized_logits

    b, s, h, w = 1, 2, 9, 9
    vals = jnp.asarray(rng.random((b, s, h, w, 3)).astype(np.float32))
    logits = jnp.asarray(
        rng.standard_normal((b, s, h, w, K * K)).astype(np.float32)
    )
    out = splat_normalized_logits(vals, logits, K)
    out2 = splat_normalized_logits(vals, logits + 123.0, K)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                               rtol=1e-5, atol=1e-6)


def test_splat_normalized_logits_firefly_rejection(rng):
    """A huge-radiance sample whose logits sit ~200 below its
    neighbors' is excluded from the output, with no NaN/Inf anywhere
    and live gradients — the upstream KernelWeighting firefly-rejection
    semantics the per-sample softmax cannot express, at a logit spread
    where the r4 per-image shift collapsed the whole image to zero."""
    from wcmc_tpu.ops.splat import splat_normalized_logits

    b, s, h, w = 1, 4, 12, 12
    vals = jnp.asarray(rng.random((b, s, h, w, 3)).astype(np.float32))
    # sample 0, pixel (6,6) is a firefly
    vals = vals.at[0, 0, 6, 6, :].set(1e4)
    logits = jnp.asarray(
        rng.standard_normal((b, s, h, w, K * K)).astype(np.float32)
    )
    base = splat_normalized_logits(
        vals.at[0, 0, 6, 6, :].set(0.0), logits, K)
    # rejection: the firefly sample's kernel is pushed way down; add a
    # +100 spike elsewhere to reproduce the global-shift death geometry
    rej = logits.at[0, 0, 6, 6, :].add(-200.0)
    rej = rej.at[0, 1, 1, 1, 0].add(100.0)
    out = splat_normalized_logits(vals, rej, K)
    assert np.isfinite(np.asarray(out)).all()
    # away from both the firefly and the +100 spike the output is
    # unaffected by the 1e4 radiance
    np.testing.assert_allclose(np.asarray(out[0, 8:, 8:]),
                               np.asarray(base[0, 8:, 8:]),
                               rtol=5e-2, atol=1e-3)
    # and typical pixels did NOT fade to zero (the r4 failure mode)
    assert float(jnp.mean(jnp.abs(out[0, 8:, 8:]))) > 0.05
    g = jax.grad(lambda lg: jnp.sum(
        splat_normalized_logits(vals, lg, K)[0, 8:, 8:] ** 2))(rej)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0.0


@pytest.mark.parametrize("kernel_h", [8, 11])
def test_pallas_gather_interpret_matches_xla(rng, kernel_h):
    """Pallas kernel logic (interpreter mode) vs XLA reference,
    including a non-divisible row-tile count."""
    pk.INTERPRET = True
    try:
        b, H, W, c = 2, kernel_h + K - 1, 16, 3
        buf = jnp.asarray(rng.standard_normal((b, H, W, c)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((b, kernel_h, W - K + 1, K * K)).astype(np.float32)
        )
        out_p = pk.gather_tpu(buf, w, K)
        out_x = ka._gather_xla(buf, w, K)
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out_x), rtol=1e-4, atol=1e-4
        )
    finally:
        pk.INTERPRET = False


@pytest.mark.parametrize("kernel_h", [8, 11])
def test_pallas_scatter_interpret_matches_xla(rng, kernel_h):
    pk.INTERPRET = True
    try:
        b, c = 2, 3
        h, ow = kernel_h, 16
        x = jnp.asarray(rng.standard_normal((b, h, ow, c)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((b, h, ow, K * K)).astype(np.float32)
        )
        out_p = pk.scatter_tpu(x, w, K)
        out_x = ka._scatter_xla(x, w, K)
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out_x), rtol=1e-4, atol=1e-4
        )
    finally:
        pk.INTERPRET = False


@pytest.mark.parametrize("kernel_h", [8, 11])
def test_pallas_outer_interpret_matches_xla(rng, kernel_h):
    pk.INTERPRET = True
    try:
        b, c = 2, 3
        h, ow = kernel_h, 12
        H, W = h + K - 1, ow + K - 1
        g = jnp.asarray(rng.standard_normal((b, h, ow, c)).astype(np.float32))
        buf = jnp.asarray(rng.standard_normal((b, H, W, c)).astype(np.float32))
        out_p = pk.outer_tpu(g, buf, K)
        out_x = ka._outer_xla(g, buf, K)
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out_x), rtol=1e-4, atol=1e-4
        )
    finally:
        pk.INTERPRET = False


# ---------------------------------------------------------------------------
# Mosaic block-shape legality (static): the real-TPU lowering requires
# the last two block dims to be (multiple of 8, multiple of 128) or
# equal to the array dims. Round 1 shipped a tile-height regression
# (49-row scatter tiles at the 72x72 K21 model shape) that interpret-
# mode tests could not catch; this sweep pins the constraint for every
# model geometry (128-patch train crops, 72-px eval tiles, K in
# {5, 13, 21}) plus degenerate small shapes.
# ---------------------------------------------------------------------------

MODEL_GEOMETRIES = [
    # (h, w, ksize): kernel-output geometry (B, h, w, K^2) weight tensors
    (108, 108, 21),   # 128-px train patch, KPCN K=21
    (72, 72, 21),     # eval tile (pad 32 / stride 64), K=21
    (116, 116, 13),   # 128-px patch, LBMC K=13
    (124, 124, 5),    # 128-px patch, K=5
    (48, 48, 21),
    (8, 40, 21),
    (5, 40, 3),       # h < 8: tile must fall back to h itself
    (1, 16, 3),
]


def _mosaic_legal(block, dim):
    return block % 8 == 0 or block == dim


@pytest.mark.parametrize("h,w,k", MODEL_GEOMETRIES)
def test_scatter_tile_rows_mosaic_legal(h, w, k):
    th = pk._scatter_tile_rows(h, w, k)
    assert 1 <= th <= max(h, 8)
    assert _mosaic_legal(th, h), (
        f"scatter tile {th} for h={h} w={w} k={k} violates Mosaic"
    )


@pytest.mark.parametrize("h,w,k", MODEL_GEOMETRIES)
def test_gather_tile_rows_mosaic_legal(h, w, k):
    th = pk._tile_rows(h)
    assert _mosaic_legal(th, h), (
        f"gather/outer tile {th} for h={h} violates Mosaic"
    )


def test_scatter_tile_rows_regression():
    # Round-1 failure shapes. 72x72 K21: the old weights-only budget
    # yielded 49 rows (not a granule multiple -> Mosaic reject). 108x108
    # K21: rounding alone gave 32 rows, which double-buffers to
    # 16.41 MiB scoped VMEM (> the 16 MiB v5e budget). The full
    # three-block model floors to the 16-row granule (bf16 logits need
    # 16-row sublane tiles) for both.
    assert pk._scatter_tile_rows(72, 72, 21, 3) == 16
    assert pk._scatter_tile_rows(108, 108, 21, 3) == 16


def test_scatter_vmem_within_budget():
    # Double-buffered block footprint (lane dim padded to 128) must
    # leave slack under the 16 MiB v5e VMEM for every model geometry.
    for h, w, k in MODEL_GEOMETRIES:
        c = 3
        th = pk._scatter_tile_rows(h, w, k, c)
        lanes_in = pk._lane_pad(w)
        lanes_out = pk._lane_pad(w + k - 1)
        per_set = 4 * th * (lanes_in * (c + k * k) + lanes_out * k * c)
        assert 2 * per_set <= 14 * 1024 * 1024 or th == min(h, 8), (
            f"scatter tile {th} for h={h} w={w} k={k}: "
            f"{2 * per_set / 2**20:.1f} MiB double-buffered"
        )


def test_scatter_partial_final_tile_interpret():
    # h=28 with th=24 leaves a partial 4-row final tile; the row pass
    # is per-row aligned so masked overflow writes must not corrupt it.
    pk.INTERPRET = True
    try:
        rng = np.random.default_rng(3)
        b, c, k = 1, 3, 21
        h, w = 28, 40
        th = pk._scatter_tile_rows(h, w, k, c)
        assert h % th != 0, "shape no longer exercises a partial tile"
        x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
        wt = jnp.asarray(
            rng.standard_normal((b, h, w, k * k)).astype(np.float32)
        )
        out_p = pk.scatter_tpu(x, wt, k)
        out_x = ka._scatter_xla(x, wt, k)
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out_x), rtol=1e-4, atol=1e-4
        )
    finally:
        pk.INTERPRET = False


# ---------------------------------------------------------------------------
# Softmax-fused kernel apply (in-kernel softmax + fused softmax VJP)
# ---------------------------------------------------------------------------

def _softmax_gather_ref(buf, logits, k):
    return ka._gather_xla(buf, jax.nn.softmax(logits, axis=-1), k)


def test_gather_softmax_xla_fallback_matches_reference(rng):
    b, c = 2, 3
    h, ow = 10, 12
    buf = jnp.asarray(
        rng.standard_normal((b, h + K - 1, ow + K - 1, c)).astype(np.float32)
    )
    logits = jnp.asarray(
        rng.standard_normal((b, h, ow, K * K)).astype(np.float32)
    )
    got = ka.kernel_gather_softmax(buf, logits, K)
    want = _softmax_gather_ref(buf, logits, K)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gather_softmax_pallas_interpret(rng):
    pk.INTERPRET = True
    ka._FORCE_XLA = False
    import wcmc_tpu.ops.mlp_fused as mf
    mf.FORCE_PALLAS = True
    try:
        b, c = 2, 3
        h, ow = 11, 12   # partial final tile (th=8)
        buf = jnp.asarray(
            rng.standard_normal((b, h + K - 1, ow + K - 1, c)).astype(np.float32)
        )
        logits = jnp.asarray(
            rng.standard_normal((b, h, ow, K * K)).astype(np.float32)
        )
        got = pk.gather_tpu(buf, logits, K, softmax=True)
        want = _softmax_gather_ref(buf, logits, K)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

        # scatter with in-kernel softmax
        x = jnp.asarray(rng.standard_normal((b, h, ow, c)).astype(np.float32))
        got_s = pk.scatter_tpu(x, logits, K, softmax=True)
        want_s = ka._scatter_xla(x, jax.nn.softmax(logits, axis=-1), K)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                                   rtol=1e-4, atol=1e-4)
    finally:
        pk.INTERPRET = False
        mf.FORCE_PALLAS = False


def test_gather_softmax_grads_interpret(rng):
    """Fused VJP (scatter-softmax dbuf + outer-softmax dlogits) vs jax
    autodiff of softmax∘gather, through the Pallas kernels in
    interpreter mode."""
    import wcmc_tpu.ops.mlp_fused as mf

    b, c = 1, 3
    h, ow = 10, 10
    buf = jnp.asarray(
        rng.standard_normal((b, h + K - 1, ow + K - 1, c)).astype(np.float32)
    )
    logits = jnp.asarray(
        0.5 * rng.standard_normal((b, h, ow, K * K)).astype(np.float32)
    )

    def loss_fused(bb, ll):
        return jnp.sum(jnp.sin(ka.kernel_gather_softmax(bb, ll, K)))

    def loss_ref(bb, ll):
        return jnp.sum(jnp.sin(_softmax_gather_ref(bb, ll, K)))

    pk.INTERPRET = True
    mf.FORCE_PALLAS = True
    try:
        db, dl = jax.grad(loss_fused, argnums=(0, 1))(buf, logits)
    finally:
        pk.INTERPRET = False
        mf.FORCE_PALLAS = False
    db_r, dl_r = jax.grad(loss_ref, argnums=(0, 1))(buf, logits)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dl), np.asarray(dl_r),
                               rtol=1e-4, atol=1e-4)


def test_gather_wc_tiles():
    """Training patches pick one lane tile; bands pick wider tiles
    bounded by the K^2-weight block VMEM budget."""
    assert pk._gather_wc(108, 21, 2) == 128
    assert pk._gather_wc(1964, 21, 2) == 128
    assert pk._gather_wc(1964, 5, 2) == 1024
    assert pk._gather_wc(1964, 5, 4) == 1024


def test_gather_wide_band_interpret(rng):
    """The 2-D-tiled gather on a multi-row-tile, multi-column-tile
    shape (forced small lane tiles) matches the XLA reference —
    the wide-band inference geometry in miniature."""
    import wcmc_tpu.ops.mlp_fused as mf

    pk.INTERPRET = True
    orig = pk._gather_wc
    pk._gather_wc = lambda *a: 128
    try:
        b, c = 1, 3
        h, ow = 40, 300   # 3 row tiles x 3 col tiles, ragged edges
        buf = jnp.asarray(
            rng.standard_normal((b, h + K - 1, ow + K - 1, c))
            .astype(np.float32)
        )
        logits = jnp.asarray(
            rng.standard_normal((b, h, ow, K * K)).astype(np.float32)
        )
        got = pk.gather_tpu(buf, logits, K, softmax=True)
        want = _softmax_gather_ref(buf, logits, K)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
        got2 = pk.gather_tpu(buf, logits, K, softmax=False)
        want2 = ka._gather_xla(buf, logits, K)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                                   rtol=1e-4, atol=1e-4)
    finally:
        pk.INTERPRET = False
        pk._gather_wc = orig
