"""Per-pixel kernel application (gather) — the KPCN hot op.

The reference delegates this to an external CUDA/Halide op
(``sbmc.modules`` KernelApply; observable contract at reference
train_kpcn.py:30 + test_models.py:218-219: a 21x21 softmax kernel is
predicted per pixel and applied to the radiance buffer as a weighted
neighborhood sum, shrinking the output by ``ksize - 1``).

TPU-native design: three mutually-adjoint primitives

* ``kernel_gather(buf, w)``  : out[p,c] = sum_d w[p,d] * buf[p+d,c]
* ``kernel_scatter(x, w)``   : out[q,c] = sum_d w[q-d,d] * x[q-d,c]   (splat)
* ``kernel_outer(g, buf)``   : dw[p,d]  = sum_c g[p,c]  * buf[p+d,c]

with custom VJPs wired pairwise (gather' -> scatter + outer,
scatter' -> gather + outer), each available as

* an XLA shift-sum reference (unrolled over the K^2 taps — correct on
  any backend, used for tests and small kernels), and
* a Pallas TPU kernel that keeps the buffer tile + halo resident in
  VMEM and streams only the (dominant) K^2-channel weight tensor from
  HBM, i.e. runs at the HBM-bandwidth speed of light for this
  bandwidth-bound op (~0.75 flop/byte).

Geometry (channels-last): ``buf (B, H, W, C)``, ``w (B, h, w, K*K)``
with ``h = H - K + 1``; gather output ``(B, h, w, C)``; scatter output
``(B, H, W, C)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from wcmc_tpu.ops import pallas_kernels


# ---------------------------------------------------------------------------
# XLA reference implementations (shift-sum; correct on all backends)
# ---------------------------------------------------------------------------

def _gather_xla(buf, w, ksize):
    b, H, W, c = buf.shape
    h, w_ = H - ksize + 1, W - ksize + 1
    out = jnp.zeros((b, h, w_, c), buf.dtype)
    for dy in range(ksize):
        for dx in range(ksize):
            d = dy * ksize + dx
            out = out + w[..., d:d + 1] * buf[:, dy:dy + h, dx:dx + w_, :]
    return out


def _scatter_xla(x, w, ksize):
    b, h, w_, c = x.shape
    H, W = h + ksize - 1, w_ + ksize - 1
    out = jnp.zeros((b, H, W, c), x.dtype)
    for dy in range(ksize):
        for dx in range(ksize):
            d = dy * ksize + dx
            out = out.at[:, dy:dy + h, dx:dx + w_, :].add(w[..., d:d + 1] * x)
    return out


def _outer_xla(g, buf, ksize):
    b, h, w_, c = g.shape
    taps = []
    for dy in range(ksize):
        for dx in range(ksize):
            taps.append(
                jnp.sum(g * buf[:, dy:dy + h, dx:dx + w_, :], axis=-1)
            )
    return jnp.stack(taps, axis=-1)


# ---------------------------------------------------------------------------
# Dispatch: Pallas on TPU, XLA elsewhere (or when forced)
# ---------------------------------------------------------------------------

_FORCE_XLA = False  # test hook


def _on_tpu():
    if _FORCE_XLA:
        return False
    import importlib

    # test hook shared with the fused-MLP ops: FORCE_PALLAS exercises
    # the Pallas dispatch (interpret mode) on any backend
    if importlib.import_module("wcmc_tpu.ops.mlp_fused").FORCE_PALLAS:
        return True
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:  # backend not initialized
        return False


def _gather_impl(buf, w, ksize):
    if _on_tpu():
        return pallas_kernels.gather_tpu(buf, w, ksize)
    return _gather_xla(buf, w, ksize)


def _scatter_impl(x, w, ksize):
    if _on_tpu():
        return pallas_kernels.scatter_tpu(x, w, ksize)
    return _scatter_xla(x, w, ksize)


def _outer_impl(g, buf, ksize):
    if _on_tpu():
        return pallas_kernels.outer_tpu(g, buf, ksize)
    return _outer_xla(g, buf, ksize)


# ---------------------------------------------------------------------------
# Differentiable primitives
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def kernel_gather(buf, w, ksize):
    return _gather_impl(buf, w, ksize)


def _gather_fwd(buf, w, ksize):
    return _gather_impl(buf, w, ksize), (buf, w)


def _gather_bwd(ksize, res, g):
    buf, w = res
    dbuf = _scatter_impl(g, w, ksize).astype(buf.dtype)
    dw = _outer_impl(g, buf, ksize).astype(w.dtype)
    return dbuf, dw


kernel_gather.defvjp(_gather_fwd, _gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def kernel_scatter(x, w, ksize):
    return _scatter_impl(x, w, ksize)


def _scatter_fwd(x, w, ksize):
    return _scatter_impl(x, w, ksize), (x, w)


def _scatter_bwd(ksize, res, g):
    x, w = res
    dx = _gather_impl(g, w, ksize).astype(x.dtype)
    dw = _outer_impl(x, g, ksize).astype(w.dtype)
    return dx, dw


kernel_scatter.defvjp(_scatter_fwd, _scatter_bwd)


# ---------------------------------------------------------------------------
# Softmax-fused variant: the per-pixel K^2 softmax (and its VJP) run
# inside the Pallas kernels, so the probability tensor and the XLA
# softmax reduce/divide/VJP fusions (~3 ms and 146 MB at the KPCN
# training shape) never exist. XLA fallback composes jax.nn.softmax
# with the shift-sum reference on other backends.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def kernel_gather_softmax(buf, logits, ksize):
    if _on_tpu():
        return pallas_kernels.gather_tpu(buf, logits, ksize, softmax=True)
    return _gather_xla(
        buf, jax.nn.softmax(logits.astype(jnp.float32), axis=-1), ksize
    )


def _gather_sm_fwd(buf, logits, ksize):
    return kernel_gather_softmax(buf, logits, ksize), (buf, logits)


def _gather_sm_bwd(ksize, res, g):
    buf, logits = res
    if _on_tpu():
        dbuf = pallas_kernels.scatter_tpu(g, logits, ksize, softmax=True)
        dlogits = pallas_kernels.outer_softmax_tpu(g, buf, logits, ksize)
        return dbuf, dlogits
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    dbuf = _scatter_xla(g, p, ksize).astype(buf.dtype)
    dp = _outer_xla(g, buf, ksize)
    dlogits = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    return dbuf, dlogits.astype(logits.dtype)


kernel_gather_softmax.defvjp(_gather_sm_fwd, _gather_sm_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def kernel_apply(buf, kernels, ksize: int, softmax: bool = True):
    """KPCN-style weighted-neighborhood reconstruction.

    Args:
      buf:     (B, H, W, C) radiance buffer.
      kernels: (B, h, w, K*K) per-pixel kernel logits, h = H - K + 1.
      softmax: normalize each pixel's K*K window with a softmax.
    Returns:
      (B, h, w, C) reconstruction.

    Any frame size that fits HBM is legal — the Pallas gather is fully
    2-D tiled (pallas_kernels.gather_tpu), so full-width 1080p bands
    work as well as 128-px training patches.
    """
    if softmax:
        # fused path: softmax + its VJP computed inside the Pallas
        # kernels (falls back to jax.nn.softmax + XLA off-TPU)
        return kernel_gather_softmax(buf, kernels, ksize)
    return kernel_gather(buf, kernels, ksize)


def kernel_apply_reference(buf, kernels, ksize: int, softmax: bool = True):
    """Pure-XLA version of :func:`kernel_apply` (any backend)."""
    if softmax:
        kernels = jax.nn.softmax(kernels, axis=-1)
    return _gather_xla(buf, kernels, ksize)
