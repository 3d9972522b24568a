"""Training losses, incl. the path-disentangling (manifold) losses.

Functional jnp counterparts of reference support/losses.py.  The
contrastive losses draw their random pairings from explicit
``jax.random`` keys (the reference mutates torch's global RNG,
support/losses.py:21,35,50), so every loss here is a pure function that
jits, vmaps, and shards.

Layouts: embedded paths ``p_buffer`` are ``(B, S, H, W, C)``; reference
radiance is ``(B, H, W, 3)``.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from wcmc_tpu.ops.colors import rgb_to_hls, hls_cartesian
from wcmc_tpu.utils.utils import tonemap_gamma

__all__ = [
    "feature_mse",
    "global_relative_similarity",
    "relative_mse",
    "smape",
    "tonemapped_mse",
    "tonemapped_relative_mse",
    "l1",
    "make_manifold_loss",
]


# ---------------------------------------------------------------------------
# Reconstruction losses (reference support/losses.py:245-331)
# ---------------------------------------------------------------------------

def relative_mse(im, ref, eps: float = 1e-2):
    """0.5 * mean((x - y)^2 / (y^2 + eps))."""
    return 0.5 * jnp.mean((im - ref) ** 2 / (ref**2 + eps))


def smape(im, ref, eps: float = 1e-2):
    """Symmetric mean absolute error; denominator carries no gradient."""
    denom = eps + jnp.abs(jax.lax.stop_gradient(im)) + jnp.abs(
        jax.lax.stop_gradient(ref)
    )
    return jnp.mean(jnp.abs(im - ref) / denom)


def _reinhard(im):
    im = jnp.maximum(im, 0.0)
    return im / (1.0 + im)


def tonemapped_mse(im, ref, eps: float = 1e-2):
    del eps
    return 0.5 * jnp.mean((_reinhard(im) - _reinhard(ref)) ** 2)


def tonemapped_relative_mse(im, ref, eps: float = 1e-2):
    im, ref = _reinhard(im), _reinhard(ref)
    return 0.5 * jnp.mean((im - ref) ** 2 / (ref**2 + eps))


def l1(im, ref):
    return jnp.mean(jnp.abs(im - ref))


# ---------------------------------------------------------------------------
# Path-disentangling losses
# ---------------------------------------------------------------------------

def _pair_sq_dists(flat_a, idx):
    """0.5 * ||a_i - a_perm(i)||^2 along the last (channel) axis.

    ``flat_a``: (..., N, C); ``idx``: permutation of N applied to the
    second-to-last axis.
    """
    permuted = jnp.take(flat_a, idx, axis=-2)
    return 0.5 * jnp.sum((flat_a - permuted) ** 2, axis=-1)


def _patch_displacement(p_buffer, ref, idx):
    """Per-pair (embedding distance - radiance distance), intra-patch.

    One shared permutation of the S*H*W positions is applied inside
    every batch element (reference support/losses.py:33-46).
    """
    b, s, h, w, c = p_buffer.shape
    p_flat = p_buffer.reshape(b, s * h * w, c)
    r_flat = ref.reshape(b, s * h * w, ref.shape[-1])
    return _pair_sq_dists(p_flat, idx) - _pair_sq_dists(r_flat, idx)


def _batch_displacement(p_buffer, ref, idx):
    """Same, with pairs drawn across the whole batch
    (reference support/losses.py:48-61)."""
    b, s, h, w, c = p_buffer.shape
    p_flat = p_buffer.reshape(b * s * h * w, c)
    r_flat = ref.reshape(b * s * h * w, ref.shape[-1])
    return _pair_sq_dists(p_flat, idx) - _pair_sq_dists(r_flat, idx)


def _prep_pair(p_buffer, ref, color):
    """Tonemap the radiance target and broadcast it over the sample axis."""
    if color == "hls":
        p_buffer = hls_cartesian(rgb_to_hls(tonemap_gamma(p_buffer)))
        ref = hls_cartesian(rgb_to_hls(tonemap_gamma(ref)))
    else:
        ref = tonemap_gamma(ref)
    s = p_buffer.shape[1]
    ref = jnp.broadcast_to(ref[:, None], (ref.shape[0], s) + ref.shape[1:])
    return p_buffer, ref


@partial(jax.jit, static_argnames=("color", "non_local"))
def feature_mse(key, p_buffer, ref, color: str = "rgb", non_local: bool = True):
    """FeatureMSE path-disentangling loss (reference support/losses.py:9-113).

    Penalizes (d_embed - d_radiance)^2 over random (sample, pixel)
    pairs so that distances in the embedded path manifold mimic
    tonemapped-radiance distances; intra-patch plus (optionally)
    intra-batch pairings.
    """
    p_buffer, ref = _prep_pair(p_buffer, ref, color)
    b, s, h, w, _ = p_buffer.shape
    k_patch, k_batch = jax.random.split(key)

    idx_patch = jax.random.permutation(k_patch, s * h * w)
    disp_p = _patch_displacement(p_buffer, ref, idx_patch)
    loss_p = 0.5 * jnp.mean(disp_p**2)

    if non_local:
        idx_batch = jax.random.permutation(k_batch, b * s * h * w)
        disp_b = _batch_displacement(p_buffer, ref, idx_batch)
        loss_b = 0.5 * jnp.mean(disp_b**2)
    else:
        loss_b = loss_p
    return loss_p + loss_b


@partial(jax.jit, static_argnames=("alpha",))
def global_relative_similarity(key, p_buffer, ref, alpha: float = 2.0):
    """GRS loss: logsumexp(alpha*[+-disp_p, +-disp_b, 0]) - log(1 + 4N),
    scaled by 1/sqrt(alpha) (reference support/losses.py:116-211)."""
    p_buffer, ref = _prep_pair(p_buffer, ref, "rgb")
    b, s, h, w, _ = p_buffer.shape
    n = b * s * h * w
    k_patch, k_batch = jax.random.split(key)

    disp_p = _patch_displacement(
        p_buffer, ref, jax.random.permutation(k_patch, s * h * w)
    ).reshape(-1)
    disp_b = _batch_displacement(
        p_buffer, ref, jax.random.permutation(k_batch, n)
    )

    exponents = alpha * jnp.concatenate(
        [disp_p, disp_b, -disp_p, -disp_b, jnp.zeros((1,), p_buffer.dtype)]
    )
    out = jax.scipy.special.logsumexp(exponents) - math.log(1 + 4 * n)
    return out / math.sqrt(alpha)


def make_manifold_loss(name: str, non_local: bool = True):
    """Factory keyed by the CLI's --manif_loss flag values."""
    if name == "FMSE":
        return partial(feature_mse, non_local=non_local)
    if name == "GRS":
        return global_relative_similarity
    raise ValueError(f"manif_loss must be 'FMSE' or 'GRS', got {name!r}")
