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
import numpy as np

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
#
# Random-pair construction. The reference draws one uniform random
# permutation per call and gathers through it
# (support/losses.py:21,35,50). An arbitrary-permutation gather of
# N ~ 3e5 rows of 3 floats is pathological on TPU (a profiled
# KPCN+manifold train step spent ~75% of its time in these gathers and
# their scatter-add transposes). The default pairing here instead
# composes layout-friendly index-free shuffles — a random cyclic shift
# (two slices) preceded by a random-divisor block transpose — which is
# still a uniformly-offset random pairing with the same distance
# statistics for shift-ergodic image data, but runs at HBM bandwidth.
# ``pairing='permutation'`` restores the exact reference behavior.
# ---------------------------------------------------------------------------


def _shuffle(flat, key, pairing: str, axis: int = -2):
    """Apply a random pairing shuffle along the position axis."""
    n = flat.shape[axis]
    if pairing == "permutation":
        idx = jax.random.permutation(key, n)
        return jnp.take(flat, idx, axis=axis)
    k1, k2 = jax.random.split(key)
    # fixed block transpose (largest small divisor) composed with TWO
    # random rolls — one before (inner-block lag), one after (global
    # lag) — yields pair lags that vary per step without any gather.
    d = next((d for d in (8, 6, 4, 3, 2) if n % d == 0), 1)
    shift1 = jax.random.randint(k1, (), 0, n)
    flat = jnp.roll(flat, shift1, axis=axis)
    if d > 1:
        ax = axis % flat.ndim
        shp = flat.shape
        y = flat.reshape(shp[:ax] + (d, n // d) + shp[ax + 1:])
        y = jnp.swapaxes(y, ax, ax + 1)
        flat = y.reshape(shp)
    shift2 = jax.random.randint(k2, (), 1, n)
    return jnp.roll(flat, shift2, axis=axis)


def _pair_sq_dists(flat_a, shuffled, channel_axis: int = -1):
    """0.5 * ||a_i - a_pair(i)||^2 along the channel axis."""
    return 0.5 * jnp.sum((flat_a - shuffled) ** 2, axis=channel_axis)


def _paired_displacement(p_flat, r_flat, key, pairing, pos_axis=-2,
                         channel_axis=-1):
    """(embed distance - radiance distance) over random pairs; the same
    pairing is applied to embeddings and radiance."""
    p_shuf = _shuffle(p_flat, key, pairing, pos_axis)
    r_shuf = _shuffle(r_flat, key, pairing, pos_axis)
    return (_pair_sq_dists(p_flat, p_shuf, channel_axis)
            - _pair_sq_dists(r_flat, r_shuf, channel_axis))


def _patch_displacement(p_buffer, ref, key, pairing, cmajor=False):
    """Intra-patch pairs: one shared shuffle of the S*H*W positions
    applied inside every batch element (reference support/losses.py:33-46)."""
    if cmajor:  # (B, S, C, H, W) -> (B, C, N): positions on the minor axis
        b, s, c, h, w = p_buffer.shape
        p_flat = jnp.transpose(p_buffer, (0, 2, 1, 3, 4)).reshape(b, c, -1)
        r_flat = jnp.transpose(ref, (0, 2, 1, 3, 4)).reshape(
            b, ref.shape[2], -1
        )
        return _paired_displacement(p_flat, r_flat, key, pairing,
                                    pos_axis=-1, channel_axis=-2)
    b, s, h, w, c = p_buffer.shape
    p_flat = p_buffer.reshape(b, s * h * w, c)
    r_flat = ref.reshape(b, s * h * w, ref.shape[-1])
    return _paired_displacement(p_flat, r_flat, key, pairing)


def _batch_displacement(p_buffer, ref, key, pairing, cmajor=False):
    """Pairs drawn across the whole batch (reference support/losses.py:48-61)."""
    if cmajor:  # (B, S, C, H, W) -> (C, B*S*H*W)
        b, s, c, h, w = p_buffer.shape
        p_flat = jnp.transpose(p_buffer, (2, 0, 1, 3, 4)).reshape(c, -1)
        r_flat = jnp.transpose(ref, (2, 0, 1, 3, 4)).reshape(
            ref.shape[2], -1
        )
        return _paired_displacement(p_flat, r_flat, key, pairing,
                                    pos_axis=-1, channel_axis=-2)
    b, s, h, w, c = p_buffer.shape
    p_flat = p_buffer.reshape(b * s * h * w, c)
    r_flat = ref.reshape(b * s * h * w, ref.shape[-1])
    return _paired_displacement(p_flat, r_flat, key, pairing)


def _prep_pair(p_buffer, ref, color, cmajor=False):
    """Tonemap the radiance target and broadcast it over the sample axis.

    ``cmajor``: p_buffer is (B, S, C, H, W) and ref (B, H, W, 3);
    returns both in (B, S, C, H, W). NOTE(perf): the channel-major
    manifold path exists because C-minor f32 tensors with 3-6 channels
    physically pad the 128-lane tile on TPU (a (8,8,128,128,6) p-buffer
    occupies 536 MB of HBM instead of 25 MB) — every crop/shuffle pass
    over them runs ~20x over bandwidth; measured ~2.5 ms/step of the
    KPCN+manifold anchor config."""
    if not cmajor:
        if color == "hls":
            p_buffer = hls_cartesian(rgb_to_hls(tonemap_gamma(p_buffer)))
            ref = hls_cartesian(rgb_to_hls(tonemap_gamma(ref)))
        else:
            ref = tonemap_gamma(ref)
        s = p_buffer.shape[1]
        ref = jnp.broadcast_to(ref[:, None], (ref.shape[0], s) + ref.shape[1:])
        return p_buffer, ref
    if color == "hls":  # correctness path: HLS math is channel-minor
        p_nhwc = jnp.moveaxis(p_buffer, 2, -1)
        p_nhwc = hls_cartesian(rgb_to_hls(tonemap_gamma(p_nhwc)))
        p_buffer = jnp.moveaxis(p_nhwc, -1, 2)
        ref = hls_cartesian(rgb_to_hls(tonemap_gamma(ref)))
    else:
        ref = tonemap_gamma(ref)
    ref = jnp.transpose(ref, (0, 3, 1, 2))            # (B, 3, H, W)
    s = p_buffer.shape[1]
    ref = jnp.broadcast_to(
        ref[:, None], (ref.shape[0], s) + ref.shape[1:]
    )
    return p_buffer, ref


@partial(jax.jit, static_argnames=("color", "non_local", "pairing", "cmajor"))
def feature_mse(key, p_buffer, ref, color: str = "rgb",
                non_local: bool = True, pairing: str = "roll",
                cmajor: bool = False):
    """FeatureMSE path-disentangling loss (reference support/losses.py:9-113).

    Penalizes (d_embed - d_radiance)^2 over random (sample, pixel)
    pairs so that distances in the embedded path manifold mimic
    tonemapped-radiance distances; intra-patch plus (optionally)
    intra-batch pairings.

    ``cmajor``: p_buffer is (B, S, C, H, W) (TPU fast path; identical
    pairs and loss value as the (B, S, H, W, C) layout).
    """
    p_buffer, ref = _prep_pair(p_buffer, ref, color, cmajor)
    k_patch, k_batch = jax.random.split(key)

    disp_p = _patch_displacement(p_buffer, ref, k_patch, pairing, cmajor)
    loss_p = 0.5 * jnp.mean(disp_p**2)

    if non_local:
        disp_b = _batch_displacement(p_buffer, ref, k_batch, pairing, cmajor)
        loss_b = 0.5 * jnp.mean(disp_b**2)
    else:
        loss_b = loss_p
    return loss_p + loss_b


@partial(jax.jit, static_argnames=("alpha", "pairing", "cmajor"))
def global_relative_similarity(key, p_buffer, ref, alpha: float = 2.0,
                               pairing: str = "roll", cmajor: bool = False):
    """GRS loss: logsumexp(alpha*[+-disp_p, +-disp_b, 0]) - log(1 + 4N),
    scaled by 1/sqrt(alpha) (reference support/losses.py:116-211)."""
    p_buffer, ref = _prep_pair(p_buffer, ref, "rgb", cmajor)
    n = int(np.prod(p_buffer.shape)) // p_buffer.shape[2 if cmajor else -1]
    k_patch, k_batch = jax.random.split(key)

    disp_p = _patch_displacement(
        p_buffer, ref, k_patch, pairing, cmajor
    ).reshape(-1)
    disp_b = _batch_displacement(p_buffer, ref, k_batch, pairing, cmajor)

    exponents = alpha * jnp.concatenate(
        [disp_p, disp_b, -disp_p, -disp_b, jnp.zeros((1,), p_buffer.dtype)]
    )
    out = jax.scipy.special.logsumexp(exponents) - math.log(1 + 4 * n)
    return out / math.sqrt(alpha)


def make_manifold_loss(name: str, non_local: bool = True,
                       pairing: str = "roll"):
    """Factory keyed by the CLI's --manif_loss flag values."""
    if name == "FMSE":
        return partial(feature_mse, non_local=non_local, pairing=pairing)
    if name == "GRS":
        return partial(global_relative_similarity, pairing=pairing)
    raise ValueError(f"manif_loss must be 'FMSE' or 'GRS', got {name!r}")
