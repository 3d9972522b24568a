"""Checkpoint save/restore.

Mirrors the reference's checkpoint contract (reference
train_kpcn.py:106-155): a ``latest_<name>`` file every epoch, a best
file on validation improvement, ``state_dict_<model>`` entries per
model plus optimizer state, ``start_epoch``, ``best_err`` and the run
args.  Storage is a single .npz-style pickle of host numpy trees —
no framework-specific serialization, loadable anywhere.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np

from wcmc_tpu.train.state import ModelState

# Version history:
#   1 — round-1 layout: per-tensor optimizer state; PathNet params as
#       nested ConvChain submodules.
#   2 — round-2/3 layout: PathNet chain params flattened to
#       embedding_w0/b0... (fused kernels), optimizer state flattened to
#       one f32 vector per model (optax.flatten). Checkpoints written
#       with version 1 are structurally incompatible; retrain or remap.
FORMAT_VERSION = 2


def _to_host(tree: Any):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, interface, epoch: int, args: Any = None,
                    description: str = "", extra: dict | None = None):
    state_dict = {
        "format_version": FORMAT_VERSION,
        "description": description,
        "start_epoch": epoch + 1,
        "model": str(interface),
        "best_err": interface.best_err,
        "args": args,
    }
    for name, state in interface.states.items():
        state_dict["state_dict_" + name] = _to_host(state.params)
        state_dict["optim_" + name] = _to_host(state.opt_state)
    if extra:
        state_dict.update(extra)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state_dict, f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_interface(interface, ck: dict, load_optim: bool = True,
                      lr_override: dict | None = None):
    """Load checkpoint trees into an interface's states in place.

    ``lr_override``: {model_name: lr} — mirrors the reference's
    fresh-lr-vs-checkpoint-lr switch (--lr_ckpt, train_kpcn.py:290-295).
    """
    from wcmc_tpu.train.state import set_learning_rate

    for name in interface.states:
        params = ck["state_dict_" + name]
        # structural check via tree transpose; raises on mismatch
        ref_struct = jax.tree_util.tree_structure(interface.states[name].params)
        new_struct = jax.tree_util.tree_structure(params)
        if ref_struct != new_struct:
            raise ValueError(
                f"checkpoint params for {name!r} do not match the model"
            )
        opt_state = interface.states[name].opt_state
        if load_optim and "optim_" + name in ck:
            host_opt = ck["optim_" + name]
            try:
                opt_state = jax.tree_util.tree_map(
                    lambda ref, new: new, opt_state, host_opt
                )
            except ValueError as e:
                raise ValueError(
                    f"optimizer state for {name!r} does not match this "
                    f"build (checkpoint format_version="
                    f"{ck.get('format_version', 1)}, current "
                    f"{FORMAT_VERSION}; see version history in "
                    "wcmc_tpu/train/checkpoint.py)"
                ) from e
        if lr_override and name in lr_override:
            set_learning_rate(opt_state, lr_override[name])
        interface.states[name] = ModelState(params=params, opt_state=opt_state)
    interface.best_err = ck.get("best_err", interface.best_err)
    return interface
