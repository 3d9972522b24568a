"""Importance-map convolutions vs scipy ground truth
(reference support/datasets.py:17-36 uses scipy gaussian_filter+sobel)."""

import numpy as np
import jax.numpy as jnp
from scipy.ndimage import gaussian_filter, sobel

from wcmc_tpu.data import importance


def test_gaussian_blur_matches_scipy(rng):
    img = rng.random((96, 80)).astype(np.float32)
    ours = np.asarray(importance._gaussian_blur(jnp.asarray(img)))
    ref = gaussian_filter(img, importance.GAUSS_SIGMA)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_sobel_matches_scipy(rng):
    img = rng.random((64, 72)).astype(np.float32)
    for axis in (0, 1):
        ours = np.asarray(importance._sobel(jnp.asarray(img), axis))
        ref = sobel(img, axis=axis, mode="nearest")
        # sign convention may differ; gradient magnitude is what matters
        np.testing.assert_allclose(np.abs(ours), np.abs(ref), rtol=1e-3,
                                   atol=1e-4)


def test_gradient_importance_map_range(rng):
    img = rng.random((96, 96, 3)).astype(np.float32)
    out = np.asarray(importance.gradient_importance_map(jnp.asarray(img)))
    assert out.shape == (96, 96)
    assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-6


def test_gradient_importance_matches_reference_formula(rng):
    """Full composition vs a scipy re-implementation of the reference."""
    img = rng.random((72, 72)).astype(np.float32)
    ours = np.asarray(importance.gradient_importance_map(jnp.asarray(img)))
    gx = sobel(gaussian_filter(img, 31), axis=0, mode="nearest")
    gy = sobel(gaussian_filter(img, 31), axis=1, mode="nearest")
    mag = np.sqrt(gx * gx + gy * gy)
    ref = (mag - mag.min()) / (mag.max() - mag.min() + 1e-5)
    np.testing.assert_allclose(ours, ref, rtol=5e-2, atol=5e-3)
