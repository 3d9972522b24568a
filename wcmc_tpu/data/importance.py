"""Patch importance sampling map, as XLA depthwise separable convolutions.

importance = 0.3 * grad(luminance) + 0.2 * grad(normal) + 0.5 * material
with grad(x) = |sobel(gaussian(x, sigma=31))| normalized to [0, 1] and
material = (diffuse + 4*glossy + 2*specular) / 7
(reference support/datasets.py:17-36, 699-715).

The Gaussian blur (sigma=31, truncate=4 -> radius 124) and Sobel
derivative are expressed as separable 1-D convolutions so the whole map
builds in a few fused XLA ops instead of a dozen scipy passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from wcmc_tpu.data import schema

GAUSS_SIGMA = 31.0
GAUSS_TRUNCATE = 4.0


def _gaussian_kernel(sigma: float, truncate: float) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _conv1d(img: jnp.ndarray, kernel: jnp.ndarray, axis: int, mode: str) -> jnp.ndarray:
    """Convolve a 2-D image along one axis with boundary padding.

    ``mode``: 'reflect' (scipy gaussian default, half-sample symmetric)
    or 'nearest' (edge replicate, scipy sobel call sites).
    """
    r = kernel.shape[0] // 2
    pad_mode = {"reflect": "symmetric", "nearest": "edge"}[mode]
    pad = [(0, 0), (0, 0)]
    pad[axis] = (r, r)
    padded = jnp.pad(img, pad, mode=pad_mode)
    if axis == 0:  # bring the convolved axis to the last position
        padded = padded.T
    out = jax.lax.conv_general_dilated(
        padded[:, None, :],                  # (N=other, C=1, L+2r)
        kernel[::-1][None, None, :],         # flip: conv == correlation (symmetric anyway)
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :]
    return out.T if axis == 0 else out


def _gaussian_blur(img: jnp.ndarray) -> jnp.ndarray:
    k = jnp.asarray(_gaussian_kernel(GAUSS_SIGMA, GAUSS_TRUNCATE))
    return _conv1d(_conv1d(img, k, 0, "reflect"), k, 1, "reflect")


def _sobel(img: jnp.ndarray, axis: int) -> jnp.ndarray:
    deriv = jnp.asarray([-1.0, 0.0, 1.0])
    smooth = jnp.asarray([1.0, 2.0, 1.0])
    if axis == 0:
        return _conv1d(_conv1d(img, deriv, 0, "nearest"), smooth, 1, "nearest")
    return _conv1d(_conv1d(img, deriv, 1, "nearest"), smooth, 0, "nearest")


def gradient_importance_map(img: jnp.ndarray) -> jnp.ndarray:
    """Normalized Gaussian-smoothed Sobel gradient magnitude of a (H, W[, C]) image."""
    if img.ndim == 2:
        img = img[..., None]
    acc = 0.0
    for c in range(img.shape[-1]):
        blurred = _gaussian_blur(img[..., c])
        acc = acc + _sobel(blurred, 0) ** 2 + _sobel(blurred, 1) ** 2
    mag = jnp.sqrt(acc)
    return (mag - mag.min()) / (mag.max() - mag.min() + 1e-5)


@functools.partial(jax.jit, static_argnames=("patch_size",))
def importance_map(
    gt: jnp.ndarray,
    sbmc_s: jnp.ndarray,
    sbmc_p: jnp.ndarray,
    patch_size: int = schema.PATCH_SIZE,
) -> jnp.ndarray:
    """Build the normalized patch-sampling probability map.

    Args:
      gt:      (H, W, 9) ground truth.
      sbmc_s:  (H, W, S, 27) cached SBMC sample buffer.
      sbmc_p:  (H, W, S, 66) cached SBMC path buffer.
    Returns:
      (H - patch_size, W - patch_size) map summing to ~1.
    """
    from wcmc_tpu.utils.utils import tonemap_reinhard_lum, linear_to_srgb

    gt_img = linear_to_srgb(tonemap_reinhard_lum(gt[..., :3], 1.5))
    diffuse = sbmc_p[..., schema.SBMC_P_IS_DIFFUSE[0]].mean(axis=2)
    glossy = sbmc_p[..., schema.SBMC_P_IS_GLOSSY[0]].mean(axis=2)
    specular = sbmc_p[..., schema.SBMC_P_IS_SPECULAR[0]].mean(axis=2)
    normal = sbmc_s[..., schema.SBMC_S_NORMAL[0]:schema.SBMC_S_NORMAL[1]].mean(axis=2)
    # normals are directions; clamp so NaN-capped sentinel values
    # (1e38, preprocess.sanitize) can't overflow the f32 gradient math
    normal = jnp.clip(normal * 0.5 + 0.5, 0.0, 1.0)

    lum = (
        0.2126 * gt_img[..., 0] + 0.7152 * gt_img[..., 1] + 0.0722 * gt_img[..., 2]
    )
    prob = (
        0.3 * gradient_importance_map(lum)
        + 0.2 * gradient_importance_map(normal)
        + 0.5 * (diffuse + glossy * 4.0 + specular * 2.0) / 7.0
    )
    half = patch_size // 2
    prob = prob[half:-half, half:-half]
    return prob / (prob.sum() + 1e-5)
