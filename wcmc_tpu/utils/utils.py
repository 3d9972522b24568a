"""Small shared image utilities (channels-last).

Counterparts of reference support/utils.py:24-67 in jnp/numpy-agnostic
form: every function works on either backend because it only uses ufunc
arithmetic and slicing.
"""

from __future__ import annotations

import jax.numpy as jnp


def crop_like(src, tgt):
    """Center-crop ``src`` spatially to match ``tgt``.

    Spatial dims are the two axes *before* the channel axis
    (channels-last layout: ``(..., H, W, C)``).  Counterpart of the
    reference's channels-first crop_like (support/utils.py:24-42).
    """
    sh, sw = src.shape[-3], src.shape[-2]
    th, tw = tgt.shape[-3], tgt.shape[-2]
    dh, dw = sh - th, sw - tw
    if dh == 0 and dw == 0:
        return src
    assert dh >= 0 and dw >= 0, f"crop_like: src {src.shape} smaller than tgt {tgt.shape}"
    top, left = dh // 2, dw // 2
    return src[..., top:sh - (dh - top), left:sw - (dw - left), :]


def crop_margin(x, margin: int):
    """Crop a fixed margin from both spatial dims of ``(..., H, W, C)``."""
    if margin == 0:
        return x
    return x[..., margin:-margin, margin:-margin, :]


def _luminance(c):
    return 0.2126 * c[..., 0:1] + 0.7152 * c[..., 1:2] + 0.0722 * c[..., 2:3]


def tonemap_reinhard(c):
    """Plain Reinhard ``x / (1 + x)`` with negative clamp."""
    c = jnp.maximum(c, 0.0)
    return c / (1.0 + c)


def tonemap_reinhard_lum(c, limit: float = 1.5):
    """Luminance-normalized Reinhard (reference support/utils.py:44-51)."""
    return c / (1.0 + _luminance(c) / limit)


def linear_to_srgb(c, gamma: float = 2.2):
    return jnp.clip(jnp.maximum(c, 0.0) ** (1.0 / gamma), 0.0, 1.0)


def tonemap_batch(c):
    """Display transform: luminance Reinhard + gamma 2.2, clipped to [0,1]."""
    col = jnp.maximum(tonemap_reinhard_lum(c, 1.5), 0.0)
    return linear_to_srgb(col)


def tonemap_gamma(img):
    """FeatureMSE's radiance transform: Reinhard then gamma 2.2
    (reference support/losses.py:63-65; 0.454545 = 1/2.2)."""
    img = jnp.maximum(img, 0.0)
    return (img / (1.0 + img)) ** 0.454545


# reference-style aliases (support/utils.py public names)
ToneMap = tonemap_reinhard_lum
LinearToSrgb = linear_to_srgb
ToneMapBatch = tonemap_batch
