"""Fused Pallas conv2d (ops/conv5.py): fwd/bwd parity with XLA conv.

Runs the Pallas path in interpreter mode on CPU (tests/conftest.py
forces the CPU backend; FORCE_PALLAS flips the TPU dispatch).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wcmc_tpu.ops import mlp_fused, pallas_kernels as pk
from wcmc_tpu.ops.conv5 import _conv_xla, conv2d


@pytest.fixture(autouse=True)
def _interpret():
    pk.INTERPRET, old_i = True, pk.INTERPRET
    mlp_fused.FORCE_PALLAS, old_f = True, mlp_fused.FORCE_PALLAS
    yield
    pk.INTERPRET = old_i
    mlp_fused.FORCE_PALLAS = old_f


CASES = [
    (2, 20, 20, 7, 13, 5, "relu"),
    (1, 36, 28, 100, 32, 5, "relu"),   # non-square, KPCN-like channels
    (2, 17, 19, 5, 9, 3, None),        # 3x3, odd sizes
    (1, 12, 12, 4, 6, 5, "leaky_relu"),
]


@pytest.mark.parametrize("b,h,w,cin,cout,k,act", CASES)
def test_conv2d_forward_matches_xla(b, h, w, cin, cout, k, act):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.1,
                      jnp.float32)
    bias = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    y = conv2d(x, wgt, bias, k, act)
    y_ref = _conv_xla(x, wgt, bias, k, act)
    assert y.shape == (b, h - k + 1, w - k + 1, cout)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("b,h,w,cin,cout,k,act", CASES[:3])
def test_conv2d_grads_match_xla(b, h, w, cin, cout, k, act):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.1,
                      jnp.float32)
    bias = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)

    def f(x_, w_, b_):
        return jnp.sum(jnp.sin(conv2d(x_, w_, b_, k, act)))

    def fr(x_, w_, b_):
        return jnp.sum(jnp.sin(_conv_xla(x_, w_, b_, k, act)))

    g = jax.grad(f, argnums=(0, 1, 2))(x, wgt, bias)
    gr = jax.grad(fr, argnums=(0, 1, 2))(x, wgt, bias)
    for got, want, name in zip(g, gr, ("dx", "dw", "db")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-3, atol=1e-3, err_msg=name)


def test_conv2d_band_tiling_covers_partial_bands():
    # h_out not divisible by the chosen band height
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 41, 24, 3)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((5, 5, 3, 8)) * 0.1, jnp.float32)
    bias = jnp.zeros((8,), jnp.float32)
    y = conv2d(x, wgt, bias, 5, None)
    y_ref = _conv_xla(x, wgt, bias, 5, None)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


def test_convchain_fused_matches_unfused():
    # same params (tree is layout-identical), same output
    from wcmc_tpu.models.blocks import ConvChain

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 7)), jnp.float32)
    chain = ConvChain(11, width=16, depth=3, ksize=5, pad=False)
    fused = ConvChain(11, width=16, depth=3, ksize=5, pad=False,
                      fused=True)
    params = chain.init(jax.random.PRNGKey(0), x)
    pf = fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(pf)
    y = chain.apply(params, x)
    yf = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(y),
                               rtol=1e-4, atol=1e-4)

    g = jax.grad(lambda p: jnp.sum(jnp.sin(chain.apply(p, x))))(params)
    gf = jax.grad(lambda p: jnp.sum(jnp.sin(fused.apply(p, x))))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3),
        g, gf)
