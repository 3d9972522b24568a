"""Device-mesh data parallelism.

Replaces the reference's single-process ``nn.DataParallel`` scatter/
gather (reference train_kpcn.py:255-271) with JAX's native sharded
compilation: a ``Mesh`` over ICI, batch arrays sharded on the leading
axis, parameters replicated, and XLA inserting the gradient
``psum``s automatically from sharding annotations.

The mesh axes are ``('data', 'spatial')``: 'data' shards the batch,
'spatial' (default size 1) is reserved for halo-exchanged spatial
sharding of full-frame inference (see parallel/halo.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_spatial: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_spatial
    devs = np.asarray(devices[: n_data * n_spatial]).reshape(
        n_data, n_spatial
    )
    return Mesh(devs, axis_names=("data", "spatial"))


def batch_spec() -> P:
    return P("data")


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict with its leading axis sharded over 'data'."""
    sharding = NamedSharding(mesh, P("data"))

    def _put(x):
        return jax.device_put(x, sharding)

    return {k: _put(v) for k, v in batch.items()}


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a parameter/state pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_step(step_fn, mesh: Mesh):
    """Compile ``step_fn(states, batch, key) -> (states, aux)`` for the
    mesh: batch sharded over 'data', states replicated.

    With these in/out shardings XLA turns the per-shard gradient
    contributions into an all-reduce over ICI — no explicit pmean
    needed because the loss averages over the global batch.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def batch_shardings(batch):
        return {k: data for k in batch}

    def wrapped(states, batch, key):
        return step_fn(states, batch, key)

    def compiled(states, batch, key):
        return jax.jit(
            wrapped,
            in_shardings=(repl, batch_shardings(batch), repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )(states, batch, key)

    return compiled
