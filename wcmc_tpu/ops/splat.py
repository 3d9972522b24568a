"""Sample splatting — the SBMC hot op.

The reference's sample-space backbone relies on an external CUDA/Halide
"kernel-splatting" op with hand-written gradients (observable contract
at reference train_sbmc.py:30 + interfaces.py:420-445: each sample
predicts a K x K kernel that scatters its radiance into the image, and
the result is normalized by the total splatted weight).

Built on the differentiable :func:`wcmc_tpu.ops.kernel_apply.kernel_scatter`
primitive (Pallas on TPU, XLA shift-sum elsewhere); the kernel is
centered, so the full ``h+K-1`` scatter canvas is center-cropped back
to ``h x w``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wcmc_tpu.ops.kernel_apply import kernel_scatter


def kernel_splat(x, weights, ksize: int):
    """Centered splat of per-position values.

    Args:
      x:       (B, h, w, C) values (e.g. per-sample radiance).
      weights: (B, h, w, K*K) non-negative splat weights.
    Returns:
      (B, h, w, C) accumulated contributions (un-normalized).
    """
    r = ksize // 2
    full = kernel_scatter(x, weights, ksize)     # (B, h+K-1, w+K-1, C)
    return full[:, r:r + x.shape[1], r:r + x.shape[2], :]


def splat_normalized(values, weights, ksize: int, eps: float = 1e-8,
                     sample_axis_name: str | None = None):
    """Weight-normalized splat over the sample axis.

    Args:
      values:  (B, S, h, w, C) per-sample values.
      weights: (B, S, h, w, K*K) per-sample non-negative weights.
      sample_axis_name: when the spp axis is sharded over a mesh axis,
        the numerator/denominator sums become psums over ICI.
    Returns:
      (B, h, w, C): sum_s splat(v_s * w_s) / (sum_s splat(w_s) + eps).
    """
    b, s, h, w, c = values.shape
    v = values.reshape(b * s, h, w, c)
    wt = weights.reshape(b * s, h, w, weights.shape[-1])
    # splat values and a ones channel in ONE pass: the K^2 weight
    # tensor (the dominant traffic) is read once instead of twice, and
    # a C=1 scatter (which Mosaic fails to lower at some geometries)
    # never exists
    ones = jnp.ones((b * s, h, w, 1), values.dtype)
    both = jnp.concatenate([v, ones], axis=-1)
    acc = kernel_splat(both, wt, ksize).reshape(b, s, h, w, c + 1).sum(axis=1)
    num, den = acc[..., :c], acc[..., c:]
    if sample_axis_name is not None:
        num = jax.lax.psum(num, sample_axis_name)
        den = jax.lax.psum(den, sample_axis_name)
    return num / (den + eps)


def splat_normalized_logits(values, logits, ksize: int, eps: float = 1e-8,
                            sample_axis_name: str | None = None):
    """Normalized splat with LOG-domain weights, stabilized per output
    pixel (the upstream KernelWeighting contract: reference
    train_sbmc.py:30 + interfaces.py:420-445 — w = exp(logit),
    normalized only by the total weight reaching each pixel, so a
    sample can reject itself, the paper's firefly suppression).

    Numerics — why per-OUTPUT-pixel stabilization and not a global
    shift: ``num/(den + eps)`` with a per-image max subtraction
    rescales every weight by ``exp(-global_max)`` while ``eps`` stays
    absolute, so the moment any single logit climbs ~19 above typical,
    ``eps`` dominates every ordinary pixel's denominator and the whole
    image fades to zero with vanishing gradients (the r4 SBMC collapse:
    frozen train_rmse 0.4816 == all-zero output). Here the shift is a
    per-output-pixel upper bound M[o] on the max contributing logit
    (window-max of the per-source-position max), which cancels exactly
    in the normalized ratio (every contribution to pixel o carries the
    same factor exp(-M[o])) and keeps den within exp(-local spread) of
    1, so eps never dominates and a logit spike can only darken its own
    K-neighborhood, never the image.

    Args:
      values:  (B, S, h, w, C) per-sample values.
      logits:  (B, S, h, w, K*K) log-domain splat weights (f32).
      sample_axis_name: spp-sharded mode; the max and the splat sums
        become collectives.
    Returns:
      (B, h, w, C) = sum splat(v * e^l) / (sum splat(e^l) + eps').
    """
    b, s, h, w, _ = values.shape
    r = ksize // 2
    logits = logits.astype(jnp.float32)
    lmax = jnp.max(logits, axis=(1, 4))                      # (B, h, w)
    if sample_axis_name is not None:
        lmax = jax.lax.pmax(lmax, sample_axis_name)
    # M[o] = max_{p in o+-r} lmax[p] >= the largest logit contributing
    # to output pixel o (contributions to o come from sources within
    # the K-window around o).
    m = jax.lax.reduce_window(
        lmax, -jnp.inf, jax.lax.max,
        window_dimensions=(1, ksize, ksize),
        window_strides=(1, 1, 1), padding="SAME",
    )
    # Contribution (p, d) lands at o = p + d - r -> its shift is
    # M[p + d - r]; edge values stand in for contributions that fall
    # outside the center crop (discarded downstream, any finite shift
    # is fine). Materialized as (B, h, w, K*K) via K^2 static slices.
    mpad = jnp.pad(m, ((0, 0), (r, r), (r, r)), mode="edge")
    shift = jnp.stack(
        [mpad[:, dy:dy + h, dx:dx + w]
         for dy in range(ksize) for dx in range(ksize)], axis=-1,
    )
    weights = jnp.exp(logits - jax.lax.stop_gradient(shift)[:, None])
    return splat_normalized(values.astype(jnp.float32), weights, ksize,
                            eps=eps, sample_axis_name=sample_axis_name)
