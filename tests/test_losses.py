"""Losses vs closed-form small cases (reference support/losses.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wcmc_tpu import losses
from wcmc_tpu.ops.colors import rgb_to_hls
from wcmc_tpu.utils.utils import tonemap_gamma


def test_relative_mse_closed_form():
    im = jnp.asarray([2.0])
    ref = jnp.asarray([1.0])
    expect = 0.5 * (1.0 / (1.0 + 1e-2))
    assert np.isclose(float(losses.relative_mse(im, ref)), expect)


def test_smape_closed_form_and_grad():
    im = jnp.asarray([3.0])
    ref = jnp.asarray([1.0])
    expect = 2.0 / (1e-2 + 3.0 + 1.0)
    assert np.isclose(float(losses.smape(im, ref)), expect)
    # denominator must carry no gradient: d/dim |im-ref|/denom = 1/denom
    g = jax.grad(lambda x: losses.smape(x, ref))(im)
    assert np.isclose(float(g[0]), 1.0 / (1e-2 + 4.0))


def test_tonemapped_losses():
    im = jnp.asarray([1.0])
    ref = jnp.asarray([0.0])
    assert np.isclose(float(losses.tonemapped_mse(im, ref)), 0.5 * 0.25)
    assert np.isclose(
        float(losses.tonemapped_relative_mse(im, ref)), 0.5 * 0.25 / 1e-2
    )


def test_feature_mse_zero_when_distances_match():
    """If the embedding *is* the tonemapped radiance (broadcast over
    samples), all pairwise displacement terms vanish."""
    key = jax.random.PRNGKey(0)
    ref = jax.random.uniform(key, (2, 8, 8, 3), minval=0.0, maxval=2.0)
    p = jnp.broadcast_to(tonemap_gamma(ref)[:, None], (2, 3, 8, 8, 3))
    loss = losses.feature_mse(key, p, ref)
    assert float(loss) < 1e-10


def test_feature_mse_nonlocal_flag():
    key = jax.random.PRNGKey(1)
    p = jax.random.uniform(key, (2, 2, 4, 4, 3))
    ref = jax.random.uniform(jax.random.PRNGKey(2), (2, 4, 4, 3))
    local = losses.feature_mse(key, p, ref, non_local=False)
    nonlocal_ = losses.feature_mse(key, p, ref, non_local=True)
    assert np.isfinite(float(local)) and np.isfinite(float(nonlocal_))
    assert not np.isclose(float(local), float(nonlocal_))


def test_grs_zero_displacement_limit():
    """With matching distances every exponent is 0 ->
    logsumexp = log(1+4N) and the loss collapses to 0."""
    key = jax.random.PRNGKey(0)
    ref = jax.random.uniform(key, (1, 4, 4, 3), minval=0.0, maxval=2.0)
    p = jnp.broadcast_to(tonemap_gamma(ref)[:, None], (1, 2, 4, 4, 3))
    loss = losses.global_relative_similarity(key, p, ref)
    assert abs(float(loss)) < 1e-5


def test_grs_matches_manual_logsumexp():
    key = jax.random.PRNGKey(3)
    b, s, h, w = 1, 2, 2, 2
    p = jax.random.uniform(key, (b, s, h, w, 3))
    ref = jax.random.uniform(jax.random.PRNGKey(4), (b, h, w, 3))
    alpha = 2.0
    loss = float(losses.global_relative_similarity(key, p, ref, alpha=alpha))
    n = b * s * h * w
    # loss is bounded below by -log(1+4n)/sqrt(alpha) (all-zero exponents)
    assert loss >= -math.log(1 + 4 * n) / math.sqrt(alpha) - 1e-6


def test_losses_are_jittable_and_grad():
    key = jax.random.PRNGKey(0)
    p = jax.random.uniform(key, (1, 2, 4, 4, 3))
    ref = jax.random.uniform(key, (1, 4, 4, 3))
    g = jax.grad(lambda x: losses.feature_mse(key, x, ref))(p)
    assert g.shape == p.shape and np.isfinite(np.asarray(g)).all()
    g2 = jax.grad(lambda x: losses.global_relative_similarity(key, x, ref))(p)
    assert np.isfinite(np.asarray(g2)).all()


def test_rgb_to_hls_roundtrip_properties():
    # pure red -> h=0, l=0.5, s=1
    hls = np.asarray(rgb_to_hls(jnp.asarray([[[1.0, 0.0, 0.0]]])))
    np.testing.assert_allclose(hls[0, 0], [0.0, 0.5, 1.0], atol=1e-6)
    # gray -> s=0
    hls = np.asarray(rgb_to_hls(jnp.asarray([[[0.5, 0.5, 0.5]]])))
    np.testing.assert_allclose(hls[0, 0], [0.0, 0.5, 0.0], atol=1e-6)
    # green -> h = 2pi/3
    hls = np.asarray(rgb_to_hls(jnp.asarray([[[0.0, 1.0, 0.0]]])))
    np.testing.assert_allclose(hls[0, 0, 0], 2 * np.pi / 3, atol=1e-6)


def test_feature_mse_hls_mode_finite():
    key = jax.random.PRNGKey(5)
    p = jax.random.uniform(key, (1, 2, 4, 4, 3))
    ref = jax.random.uniform(key, (1, 4, 4, 3))
    loss = losses.feature_mse(key, p, ref, color="hls")
    assert np.isfinite(float(loss))


def test_roll_pairing_statistically_matches_permutation():
    """The layout-friendly roll pairing must produce the same loss
    statistics as the reference's full random permutation."""
    key0 = jax.random.PRNGKey(0)
    p = jax.random.uniform(key0, (2, 4, 8, 8, 3))
    ref = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3)) * 2.0

    def collect(pairing, n=24):
        vals = []
        for i in range(n):
            k = jax.random.PRNGKey(100 + i)
            vals.append(float(losses.feature_mse(k, p, ref, pairing=pairing)))
        return np.asarray(vals)

    roll = collect("roll")
    perm = collect("permutation")
    assert abs(roll.mean() - perm.mean()) < 4 * perm.std() / np.sqrt(len(perm)) + 1e-4, (
        roll.mean(), perm.mean(), perm.std(),
    )


def test_pairing_shuffle_is_a_permutation():
    """_shuffle must be a bijection on positions (no lost/duplicated rows)."""
    n = 24
    x = jnp.arange(n, dtype=jnp.float32).reshape(1, n, 1)
    out = losses._shuffle(x, jax.random.PRNGKey(3), "roll")
    assert sorted(np.asarray(out).ravel().tolist()) == list(range(n))
    out2 = losses._shuffle(x, jax.random.PRNGKey(4), "permutation")
    assert sorted(np.asarray(out2).ravel().tolist()) == list(range(n))


def test_make_manifold_loss():
    assert losses.make_manifold_loss("FMSE") is not None
    assert losses.make_manifold_loss("GRS") is not None
    with pytest.raises(ValueError):
        losses.make_manifold_loss("nope")


def test_cmajor_layout_matches_nhwc():
    """The channel-major TPU fast path must produce the same loss values
    as the (B,S,H,W,C) layout — identical pairs, same distances."""
    key = jax.random.PRNGKey(7)
    kp, kr = jax.random.split(key)
    p = jax.random.normal(kp, (2, 3, 8, 8, 4))
    ref = jax.random.uniform(kr, (2, 8, 8, 3))
    p_cm = jnp.transpose(p, (0, 1, 4, 2, 3))
    for pairing in ("roll", "permutation"):
        for fn, kw in (
            (losses.feature_mse, dict(pairing=pairing)),
            (losses.global_relative_similarity, dict(pairing=pairing)),
        ):
            a = float(fn(jax.random.PRNGKey(11), p, ref, **kw))
            b = float(fn(jax.random.PRNGKey(11), p_cm, ref, cmajor=True, **kw))
            assert abs(a - b) < 1e-5 * max(1.0, abs(a)), (pairing, fn, a, b)
    # hls correctness path
    a = float(losses.feature_mse(jax.random.PRNGKey(5), p[..., :3], ref,
                                 color="hls"))
    b = float(losses.feature_mse(jax.random.PRNGKey(5),
                                 jnp.transpose(p[..., :3], (0, 1, 4, 2, 3)),
                                 ref, color="hls", cmajor=True))
    assert abs(a - b) < 1e-5 * max(1.0, abs(a))


def test_cmajor_grads_match_nhwc():
    key = jax.random.PRNGKey(2)
    p = jax.random.normal(key, (1, 2, 6, 6, 4))
    ref = jax.random.uniform(jax.random.PRNGKey(3), (1, 6, 6, 3))
    k = jax.random.PRNGKey(9)
    g1 = jax.grad(lambda q: losses.feature_mse(k, q, ref))(p)
    g2 = jax.grad(
        lambda q: losses.feature_mse(
            k, jnp.transpose(q, (0, 1, 4, 2, 3)), ref, cmajor=True
        )
    )(p)
    assert float(jnp.max(jnp.abs(g1 - g2))) < 1e-5
