"""Spatially-sharded full-frame inference with halo exchange.

The reference decomposes full frames into overlap tiles on ONE device
(reference datasets.py:1277-1300, test_models.py:58-91).  On a TPU
mesh the same decomposition runs as true spatial sharding: each chip
holds a horizontal band of the frame, exchanges ``halo`` boundary rows
with its mesh neighbors over ICI (``jax.lax.ppermute``), runs the
denoiser on its padded band, and crops back to exactly its band — so
the concatenated result equals the single-device full-frame forward
over the globally-valid interior (the same consistency contract the
tiled path satisfies; see tests/test_parallel.py).

Geometry: with a VALID-conv model of total shrink ``s`` (56 for KPCN)
and ``halo >= s/2``, a band of ``Hn`` rows padded by ``halo`` on each
side yields ``Hn + 2*halo - s`` output rows, center-cropped to ``Hn``.
Bands at the frame edge receive zero halos (ppermute edge behavior);
their outer ``s/2`` rows are invalid, exactly like the single-device
boundary, and are cropped by the evaluation protocol
(reference test_models.py:217-219).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _h_axis(name: str) -> int:
    """Row axis per batch key: pixel keys (B, H, W, C) -> 1,
    sample keys (B, S, H, W, C) -> 2."""
    return 2 if name in ("paths", "radiance", "features") else 1


def _exchange_halo(x: jnp.ndarray, axis_name: str, h_axis: int, halo: int):
    """Pad a band with ``halo`` rows from each mesh neighbor over ICI."""
    n = jax.lax.axis_size(axis_name)

    def take(arr, start, size):
        idx = [slice(None)] * arr.ndim
        idx[h_axis] = slice(start, start + size) if start >= 0 else slice(start, None)
        return arr[tuple(idx)]

    bottom = take(x, -halo, halo)        # my last rows -> neighbor below
    top = take(x, 0, halo)               # my first rows -> neighbor above
    from_above = jax.lax.ppermute(
        bottom, axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    from_below = jax.lax.ppermute(
        top, axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    return jnp.concatenate([from_above, x, from_below], axis=h_axis)


def _crop_rows(x: jnp.ndarray, h_axis: int, crop: int):
    if crop == 0:
        return x
    idx = [slice(None)] * x.ndim
    idx[h_axis] = slice(crop, -crop)
    return x[tuple(idx)]


def make_spatial_inference(apply_fn, mesh: Mesh, batch_keys, shrink: int,
                           halo: int = 32, axis: str = "spatial"):
    """Compile a spatially-sharded full-frame forward.

    Args:
      apply_fn: params, batch -> (B, h, w, 3) image (VALID geometry,
        total spatial shrink ``shrink``; e.g. the KPCN radiance head).
      mesh: device mesh containing axis ``axis``.
      batch_keys: the keys present in the batch dict.
      shrink: model's total VALID shrink (rows lost top+bottom).
      halo: boundary rows exchanged; must satisfy 2*halo >= shrink and
        keep band+2*halo compatible with any pooling divisibility.
    Returns:
      fn(params, batch) -> (B, H, W, 3) with rows sharded over ``axis``.
      Rows within shrink/2 of the frame edge are boundary-invalid,
      exactly as in the unsharded forward.
    """
    assert 2 * halo >= shrink, (halo, shrink)
    extra = (2 * halo - shrink) // 2   # surplus output rows per side

    in_specs = {}
    for k in batch_keys:
        spec = [None] * 5
        spec[_h_axis(k)] = axis
        in_specs[k] = P(*spec[:4]) if _h_axis(k) == 1 else P(*spec[:5])

    def local_fn(params, batch):
        padded = {
            k: _exchange_halo(v, axis, _h_axis(k), halo)
            for k, v in batch.items()
        }
        out = apply_fn(params, padded)       # (B, band + 2*halo - shrink, W', 3)
        out = _crop_rows(out, 1, extra)
        # restore full width with edge-invalid columns so the output
        # shape matches the input frame (columns shrink/2 each side)
        pad_w = shrink // 2
        return jnp.pad(
            out, ((0, 0), (0, 0), (pad_w, pad_w), (0, 0)), mode="edge"
        )

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), in_specs),
        out_specs=P(None, axis, None, None),
    )

    @jax.jit
    def run(params, batch):
        return sharded(params, batch)

    return run


def kpcn_spatial_inference(model, mesh: Mesh, halo: int = 32,
                           axis: str = "spatial"):
    """Spatially-sharded KPCN radiance forward over a mesh axis."""

    def apply_fn(params, batch):
        return model.apply({"params": params}, batch)["radiance"]

    keys = (
        "kpcn_diffuse_in", "kpcn_specular_in", "kpcn_diffuse_buffer",
        "kpcn_specular_buffer", "kpcn_albedo",
    )
    return make_spatial_inference(apply_fn, mesh, keys, model.shrink, halo,
                                  axis)
