"""Color-space transforms (channels-last).

Replaces the reference's single external color dependency,
``kornia.rgb_to_hls`` (reference support/losses.py:2,72), with a native
jnp implementation usable inside jitted losses.
"""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_hls(img: jnp.ndarray) -> jnp.ndarray:
    """RGB -> HLS. ``img``: (..., 3) in [0, 1]. H in radians [0, 2pi).

    Matches kornia's convention (hue in radians) so FeatureMSE's
    Cartesian HLS embedding is numerically comparable.
    """
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    l = (maxc + minc) / 2.0
    delta = maxc - minc
    safe_delta = jnp.where(delta == 0, 1.0, delta)

    hr = ((g - b) / safe_delta) % 6.0
    hg = (b - r) / safe_delta + 2.0
    hb = (r - g) / safe_delta + 4.0
    h = jnp.where(maxc == r, hr, jnp.where(maxc == g, hg, hb))
    h = jnp.where(delta == 0, 0.0, h) * (jnp.pi / 3.0)

    denom = 1.0 - jnp.abs(2.0 * l - 1.0)
    s = jnp.where(delta == 0, 0.0, delta / jnp.where(denom == 0, 1.0, denom))
    return jnp.stack([h, l, s], axis=-1)


def hls_cartesian(img: jnp.ndarray) -> jnp.ndarray:
    """Cylindrical HLS -> Cartesian coords used by FeatureMSE
    (reference support/losses.py:67-80): (s*cos h, 2l, s*sin h)."""
    h, l, s = img[..., 0], img[..., 1], img[..., 2]
    return jnp.stack([s * jnp.cos(h), 2.0 * l, s * jnp.sin(h)], axis=-1)
