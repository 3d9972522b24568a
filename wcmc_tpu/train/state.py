"""Functional per-model training state.

The reference couples each model with a torch optimizer object inside
an "interface" (reference interfaces.py:18-33).  Here state is an
explicit pytree — ``(params, opt_state)`` — so a whole dict of model
states threads through one jitted, donated train step and shards
transparently under a mesh.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class ModelState:
    params: Any
    opt_state: Any


def init_model_state(module, sample_batch, tx, key=None) -> ModelState:
    key = key if key is not None else jax.random.PRNGKey(0)
    params = module.init(key, sample_batch)["params"]
    return ModelState(params=params, opt_state=tx.init(params))


def adam_with_clip(lr, clip_value: float | None = None,
                   clip_norm: float | None = None,
                   warmup_steps: int = 0):
    """Adam preceded by the reference's gradient clipping flavor
    (value clip for KPCN, global-norm clip for SBMC/LBMC;
    reference interfaces.py:261,454-458,826-832).

    The learning rate is injected as a mutable hyperparameter so epoch
    schedulers (e.g. LBMC's StepLR) can update it in place.

    NOTE(perf): the whole chain runs through ``optax.flatten`` — one
    contiguous f32 vector per model instead of per-tensor updates.
    Profiled on v5e, per-weight Adam fusions on the KPCN [5,5,100,100]
    conv tensors cost ~0.33 ms EACH (~7 ms/step across the stack; XLA
    tiles the small-dim-leading layouts poorly); the flat vector runs
    the same math at HBM bandwidth (<0.5 ms). Clipping semantics are
    unchanged: value clip is elementwise and the global norm is
    layout-invariant.

    ``warmup_steps > 0`` multiplies the update by a linear 0->1 ramp
    over that many steps (reference support/: none — TPU extension;
    at the reference's SBMC lr 5e-4 the first optimizer steps on a
    small corpus saturate the output head's ReLUs, observed in the r2
    capacity study, and a short warmup removes that failure mode
    without touching the mutable learning-rate hyperparameter that
    ``set_learning_rate`` / the LBMC StepLR scheduler edit in place).
    """
    chain = []
    if clip_value is not None:
        chain.append(optax.clip(clip_value))
    if clip_norm is not None:
        chain.append(optax.clip_by_global_norm(clip_norm))
    chain.append(optax.inject_hyperparams(optax.adam)(learning_rate=lr))
    if warmup_steps:
        chain.append(optax.scale_by_schedule(
            lambda step: jnp.minimum(1.0, (step + 1) / warmup_steps)
        ))
    return optax.flatten(optax.chain(*chain))


def set_learning_rate(opt_state, lr):
    """Update the injected learning rate inside an optimizer state tree.

    Raises if no ``inject_hyperparams`` node holds a ``learning_rate``
    — a silent no-op here would quietly disable epoch schedulers
    (e.g. LBMC's StepLR) if the optax chain layout ever drifts.
    """
    hits = 0
    for sub in opt_state:
        if (
            isinstance(sub, optax.InjectStatefulHyperparamsState)
            or hasattr(sub, "hyperparams")
        ) and "learning_rate" in sub.hyperparams:
            sub.hyperparams["learning_rate"] = jnp.asarray(lr)
            hits += 1
    if hits == 0:
        raise ValueError(
            "set_learning_rate found no learning_rate hyperparameter in "
            f"the optimizer state chain ({[type(s).__name__ for s in opt_state]})"
        )
    return opt_state


def get_learning_rate(opt_state):
    for sub in opt_state:
        if hasattr(sub, "hyperparams"):
            return float(sub.hyperparams["learning_rate"])
    return None


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
