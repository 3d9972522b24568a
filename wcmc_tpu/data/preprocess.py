"""On-device (jit-compiled) feature preprocessing.

TPU-first re-design of the reference's NumPy preprocessing pass
(reference support/datasets.py:301-582): every transform is a pure
``jnp`` function over the raw ``(H, W, S, 104)`` sample dump, so the
whole pass fuses into a handful of XLA kernels and can run on-device,
on the host CPU backend, or be vmapped over shards.

All outputs are channels-last.  Transform constants (log scalings,
epsilons, the ``/19`` bounce-type normalization, the Burley
sqrt-roughness perceptual linearization) are behavioral contracts of
the data pipeline and match the reference bit-for-bit in float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from wcmc_tpu.data import schema

FINITE_CAP = 1.0e38


def sanitize(x: jnp.ndarray) -> jnp.ndarray:
    """Zero non-finite samples; clamp finite values to ±1e38.

    NOTE(deviation): reference support/datasets.py:622-624 replaces
    NaN/Inf with a 1e38 sentinel. That sentinel is a latent defect:
    it overflows every squared-moment downstream, and in the LLPM
    path descriptor the polynomial channels (bounce one-hots /19,
    sqrt(roughness)) turn it into ~5e36 features that saturate
    PathNet and NaN whole frames through the conv receptive field
    (r4 eval finding). Corrupt samples carry no signal — a
    production ingest rejects them, so they are zeroed here (0 is
    radiance-neutral and in-range for every raw channel)."""
    x = jnp.where(jnp.isfinite(x), x, 0.0)
    return jnp.clip(x, -FINITE_CAP, FINITE_CAP)


def _rng(x, r):
    return x[..., r[0]:r[1]]


@jax.jit
def preprocess_llpm(sample: jnp.ndarray) -> jnp.ndarray:
    """Raw ``(..., 104)`` samples -> 37-ch LLPM path descriptor.

    Column 0 is the log path weight (later split off as a pixel
    feature); columns 1: are the 36-ch PathNet input
    (reference support/datasets.py:301-361).
    """
    path_weight = jnp.log(_rng(sample, schema.PATH_WEIGHT) + 1e-6) / 90.0
    rad_wo_w = jnp.log(_rng(sample, schema.RADIANCE_WO_WEIGHT) + 1e-6) / 30.0
    light = jnp.log(_rng(sample, schema.LIGHT_INTENSITY) + 1e-8) / 10.0
    throughputs = jnp.log(_rng(sample, schema.THROUGHPUTS) + 1e-6) / 30.0
    # clamp the polynomial channels to their physical ranges (bounce
    # codes 0..19, roughness 0..1) — a no-op for valid data, and it
    # keeps any out-of-range garbage from saturating PathNet (the log
    # channels above compress outliers on their own)
    bounce_types = jnp.clip(_rng(sample, schema.BOUNCE_TYPES), 0.0, 19.0) / 19.0
    roughnesses = jnp.sqrt(jnp.clip(_rng(sample, schema.ROUGHNESSES), 0.0, 1.0))
    return jnp.concatenate(
        [path_weight, rad_wo_w, light, throughputs, bounce_types, roughnesses],
        axis=-1,
    )


@jax.jit
def preprocess_sbmc(sample: jnp.ndarray):
    """Raw ``(..., 104)`` samples -> (27-ch sample buffer, 66-ch path buffer).

    reference support/datasets.py:363-485.
    """
    # clip the LINEAR radiance channels so 1e38 NaN sentinels can't
    # overflow f32 in downstream squared-error math (see preprocess_kpcn)
    total = jnp.clip(_rng(sample, schema.RADIANCE), 0.0, 1e10)
    diffuse = jnp.clip(_rng(sample, schema.DIFFUSE), 0.0, 1e10)
    specular = jnp.log1p(jnp.maximum(total - diffuse, 0.0)) / 10.0
    subpixel = _rng(sample, schema.SUBPIXEL)
    g_buffer = sample[..., schema.ALBEDO_AT_FIRST[0]:schema.HAS_HIT[1]]

    probabilities = (
        jnp.log(jnp.maximum(_rng(sample, schema.PROBABILITIES), 0.0) + 1e-5) / 30.0
    )
    light_dirs = jnp.clip(_rng(sample, schema.LIGHT_DIRECTIONS), -1.0, 1.0)

    bounce = _rng(sample, schema.BOUNCE_TYPES).astype(jnp.int32)
    bits = [
        (jnp.bitwise_and(bounce, 1 << b) != 0).astype(jnp.float32)
        for b in range(5)  # reflection, transmission, diffuse, glossy, specular
    ]

    s_buffer = jnp.concatenate(
        [total, jnp.log1p(total) / 10.0, specular, subpixel, g_buffer], axis=-1
    )
    p_buffer = jnp.concatenate([probabilities, light_dirs] + bits, axis=-1)
    return s_buffer, p_buffer


def _spatial_gradients(buf: jnp.ndarray) -> jnp.ndarray:
    """Forward-difference dx/dy with zero padding at the leading edge.

    ``buf`` is ``(H, W, C)``; returns ``(H, W, 2C)`` = [dx, dy]
    (reference support/datasets.py:286-299).
    """
    dx = buf[:, 1:, :] - buf[:, :-1, :]
    dy = buf[1:, :, :] - buf[:-1, :, :]
    dx = jnp.pad(dx, ((0, 0), (1, 0), (0, 0)))
    dy = jnp.pad(dy, ((1, 0), (0, 0), (0, 0)))
    return jnp.concatenate([dx, dy], axis=-1)


@jax.jit
def preprocess_kpcn(sample: jnp.ndarray) -> jnp.ndarray:
    """Raw ``(H, W, S, 104)`` samples -> 44-ch KPCN pixel statistics.

    Albedo-factored diffuse, log specular, per-feature variances scaled
    by 1/spp, frame-normalized depth, and forward-difference gradients
    (reference support/datasets.py:487-582, incl. the upstream
    specular-variance normalization quirk noted at datasets.py:543-551).
    """
    spp = sample.shape[2]
    eps = schema.ALBEDO_EPS

    # The NaN-handling sentinel cap is 1e38 (reference datasets.py:622);
    # squaring it in the variance/normalization math overflows f32 to
    # inf and poisons the cache with NaN (latent in the reference too).
    # Clip to 1e10 first: identical for normal-range data, finite
    # moments for capped outliers.
    sample = jnp.clip(sample, -1e10, 1e10)

    def mean_var(x):
        return x.mean(axis=2), x.var(axis=2).mean(axis=2, keepdims=True) / spp

    normal, normal_v = mean_var(_rng(sample, schema.NORMAL_AT_DIFF))

    depth_s = _rng(sample, schema.DEPTH_AT_DIFF)
    depth = depth_s.mean(axis=2)
    depth_v = depth_s.var(axis=2)
    max_depth = depth.max()
    safe = jnp.maximum(max_depth, 1e-20)
    depth = jnp.where(max_depth > 0, depth / safe, depth)
    depth_v = jnp.where(max_depth > 0, depth_v / (safe * safe * spp), depth_v)
    depth = jnp.clip(depth, 0.0, 1.0)

    albedo_s = _rng(sample, schema.ALBEDO_AT_DIFF)
    albedo, albedo_v = mean_var(albedo_s)
    albedo_sqr = ((albedo + eps) ** 2).mean(axis=2, keepdims=True)

    diff_s = jnp.maximum(_rng(sample, schema.DIFFUSE), 0.0)
    diffuse, diffuse_v = mean_var(diff_s)

    spec_s = jnp.maximum(jnp.maximum(_rng(sample, schema.RADIANCE), 0.0) - diff_s, 0.0)
    specular, specular_v = mean_var(spec_s)
    specular_sqr = ((1.0 + specular) ** 2).mean(axis=2, keepdims=True)

    diffuse = diffuse / (albedo + eps)
    diffuse_v = diffuse_v / albedo_sqr
    specular = jnp.log1p(specular)
    specular_v = specular_v / specular_sqr

    feats = []
    for f, v in (
        (diffuse, diffuse_v),
        (specular, specular_v),
        (normal, normal_v),
        (depth, depth_v),
        (albedo, albedo_v),
    ):
        feats += [f, v, _spatial_gradients(f)]
    return jnp.concatenate(feats, axis=-1)


# ---------------------------------------------------------------------------
# Batch assembly: cached buffers -> model input dicts
# ---------------------------------------------------------------------------

def kpcn_net_inputs(kpcn_buffer: jnp.ndarray) -> dict:
    """Split the cached 44-ch KPCN buffer into model-input keys.

    Mirrors reference support/datasets.py:1080-1084: the diffuse branch
    sees [diffuse stats | normal..albedo stats] and the specular branch
    sees [specular stats | normal..albedo stats]; both are 34-ch.
    """
    return {
        "kpcn_diffuse_in": jnp.concatenate(
            [kpcn_buffer[..., :10], kpcn_buffer[..., 20:]], axis=-1
        ),
        "kpcn_specular_in": kpcn_buffer[..., 10:],
        "kpcn_diffuse_buffer": kpcn_buffer[..., 0:3],
        "kpcn_specular_buffer": kpcn_buffer[..., 10:13],
        "kpcn_albedo": kpcn_buffer[..., 34:37] + schema.ALBEDO_EPS,
    }


def kpcn_targets(gt: jnp.ndarray) -> dict:
    """GT ``(H, W, 9)`` -> albedo-factored diffuse / log specular targets
    (reference support/datasets.py:1120-1126)."""
    total = _rng(gt, schema.GT_RADIANCE)
    diffuse = _rng(gt, schema.GT_DIFFUSE)
    albedo = _rng(gt, schema.GT_ALBEDO)
    return {
        "target_total": total,
        "target_diffuse": diffuse / (albedo + schema.ALBEDO_EPS),
        # clamp keeps log1p finite when MC noise makes diffuse > total
        "target_specular": jnp.log1p(jnp.maximum(total - diffuse, -0.9999)),
    }


def sbmc_features(
    s_buffer: jnp.ndarray,
    p_buffer: jnp.ndarray | None,
    use_g_buf: bool = True,
    use_sbmc_buf: bool = True,
) -> dict:
    """Cached SBMC buffers -> {'radiance', 'features'} sample-space keys
    (reference support/datasets.py:1053-1073)."""
    radiance = s_buffer[..., :3]
    if use_g_buf:
        feats = s_buffer[..., 3:27]
    else:
        feats = s_buffer[..., 3:6]
    if use_sbmc_buf:
        assert p_buffer is not None
        feats = jnp.concatenate([feats, p_buffer], axis=-1)
    return {"radiance": radiance, "features": feats}


def kpcn_recombine(diffuse: jnp.ndarray, specular: jnp.ndarray,
                   albedo: jnp.ndarray) -> jnp.ndarray:
    """Invert the KPCN factorization: ``diffuse*albedo + exp(specular) - 1``
    (reference support/datasets.py:1236)."""
    return diffuse * albedo + jnp.expm1(specular)


@functools.partial(jax.jit, static_argnames=("spp",))
def llpm_from_raw(sample: jnp.ndarray, spp: int):
    """Convenience: raw dump -> (pixel path-weight feature, 36-ch paths)."""
    buf = preprocess_llpm(sample[:, :, :spp, :])
    return buf[..., :1].mean(axis=2), buf[..., 1:]
