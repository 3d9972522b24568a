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
