"""Sample-axis (spp) parallelism.

High-spp frames are the reference's memory ceiling ("support up to 64
spp due to the lack of gpu memory", reference datasets.py:655).  Here
the spp axis shards across mesh devices: per-sample work (embeddings,
kernel heads) stays local, and the cross-sample reductions — PathNet's
context mean, SBMC's propagation means and splat normalization, LBMC's
layer accumulations — become ``pmean``/``psum`` collectives over ICI
(each model exposes ``sample_axis_name`` for this).
"""

from __future__ import annotations

import dataclasses

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

SAMPLE_KEYS = ("paths", "radiance", "features")


def _specs_for(batch_keys, axis):
    specs = {}
    for k in batch_keys:
        if k in SAMPLE_KEYS:
            specs[k] = P(None, axis)      # (B, S, H, W, C): shard S
        else:
            specs[k] = P()                # pixel-space keys replicated
    return specs


def make_sample_parallel(model, mesh: Mesh, batch_keys,
                         axis: str = "spatial",
                         output_sharded: bool | None = None):
    """Compile a forward with the spp axis sharded over ``axis``.

    Args:
      model: a Flax module exposing ``sample_axis_name``.
      batch_keys: keys of the batch dict it will receive.
      output_sharded: True when the model's output keeps the sample
        axis (PathNet), False for image outputs (SBMC/LBMC).  Inferred
        from the model class when None.
    Returns:
      fn(params, batch) -> output (sample axis sharded when applicable).
    """
    sp_model = dataclasses.replace(model, sample_axis_name=axis)
    if output_sharded is None:
        output_sharded = type(model).__name__ == "PathNet"

    def local_fn(params, batch):
        return sp_model.apply({"params": params}, batch)

    out_spec = P(None, axis) if output_sharded else P()
    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), _specs_for(batch_keys, axis)),
        out_specs=out_spec,
        check_vma=False,
    )
    return jax.jit(sharded)
