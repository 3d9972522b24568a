"""Checkpoint save/restore round trips (reference train_kpcn.py:106-155
contract: latest/best files, state_dict_<model> entries, resume)."""

import os

import jax
import numpy as np
import pytest

from wcmc_tpu.data.batches import synthetic_batch
from wcmc_tpu.train.checkpoint import (
    load_checkpoint,
    restore_interface,
    save_checkpoint,
)
from wcmc_tpu.train.factory import TrainConfig, init_interfaces
from wcmc_tpu.train.state import get_learning_rate, set_learning_rate


def _leaves(tree):
    return jax.tree_util.tree_leaves(tree)


@pytest.fixture(scope="module")
def trained_iface(rng):
    cfg = TrainConfig(base_model="kpcn", kpcn_ksize=5, finite_check_every=1)
    iface = init_interfaces(cfg)[0]
    batch = synthetic_batch(rng, "kpcn", batch_size=1, patch=48, spp=2)
    iface.preprocess(batch)
    iface.train_batch(batch)
    return iface, batch


def test_checkpoint_roundtrip(tmp_path, trained_iface):
    iface, batch = trained_iface
    path = str(tmp_path / "model.ckpt")
    iface.best_err = 0.123
    save_checkpoint(path, iface, epoch=3, description="test run")
    ck = load_checkpoint(path)
    assert ck["start_epoch"] == 4
    assert ck["best_err"] == 0.123
    assert "state_dict_dncnn" in ck and "optim_dncnn" in ck

    cfg = TrainConfig(base_model="kpcn", kpcn_ksize=5, finite_check_every=1)
    fresh = init_interfaces(cfg)[0]
    before = np.asarray(_leaves(fresh.states["dncnn"].params)[0]).copy()
    restore_interface(fresh, ck)
    after = np.asarray(_leaves(fresh.states["dncnn"].params)[0])
    trained = np.asarray(_leaves(iface.states["dncnn"].params)[0])
    np.testing.assert_array_equal(after, trained)
    assert not np.array_equal(before, after)
    assert fresh.best_err == 0.123

    # restored interface must still train
    fresh.preprocess(batch)
    ld = fresh.train_batch(batch)
    assert np.isfinite(float(ld["l_total"]))


def test_checkpoint_shape_mismatch_rejected(tmp_path, trained_iface):
    iface, _ = trained_iface
    path = str(tmp_path / "model2.ckpt")
    save_checkpoint(path, iface, epoch=0)
    ck = load_checkpoint(path)
    cfg = TrainConfig(base_model="kpcn", kpcn_ksize=5,
                      use_llpm_buf=True, manif_learn=True,
                      manif_loss="FMSE", finite_check_every=1)
    other = init_interfaces(cfg)[0]
    with pytest.raises((ValueError, KeyError)):
        restore_interface(other, ck)


def test_lr_override(tmp_path, trained_iface):
    iface, _ = trained_iface
    path = str(tmp_path / "model3.ckpt")
    save_checkpoint(path, iface, epoch=0)
    ck = load_checkpoint(path)
    cfg = TrainConfig(base_model="kpcn", kpcn_ksize=5, finite_check_every=1)
    fresh = init_interfaces(cfg)[0]
    restore_interface(fresh, ck, lr_override={"dncnn": 5e-6})
    assert abs(get_learning_rate(fresh.states["dncnn"].opt_state) - 5e-6) < 1e-9


def test_set_learning_rate():
    cfg = TrainConfig(base_model="kpcn", kpcn_ksize=5, finite_check_every=1)
    iface = init_interfaces(cfg)[0]
    set_learning_rate(iface.states["dncnn"].opt_state, 3e-4)
    assert abs(get_learning_rate(iface.states["dncnn"].opt_state) - 3e-4) < 1e-9


def test_set_learning_rate_raises_without_hyperparams():
    """A chain without inject_hyperparams must fail loudly, not no-op
    (a silent miss would disable LBMC's StepLR)."""
    import optax
    import pytest as _pytest

    tx = optax.adam(1e-4)
    opt_state = tx.init({"w": np.zeros((3,), np.float32)})
    with _pytest.raises(ValueError, match="learning_rate"):
        set_learning_rate(opt_state, 1e-5)


def test_warmup_scales_updates_and_keeps_mutable_lr():
    """adam_with_clip(warmup_steps=N) ramps the update linearly while
    set_learning_rate still finds the injected hyperparameter."""
    import jax.numpy as jnp
    import numpy as np

    from wcmc_tpu.train.state import adam_with_clip

    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.full((4,), 0.5)}

    tx = adam_with_clip(1e-2, clip_norm=1000.0, warmup_steps=4)
    st = tx.init(params)
    u1, st = tx.update(grads, st, params)
    u2, st = tx.update(grads, st, params)

    tx0 = adam_with_clip(1e-2, clip_norm=1000.0)
    st0 = tx0.init(params)
    v1, st0 = tx0.update(grads, st0, params)
    v2, st0 = tx0.update(grads, st0, params)

    # step 1 scaled by 1/4, step 2 by 2/4 of the unwarmed update
    np.testing.assert_allclose(u1["w"], v1["w"] * 0.25, rtol=1e-6)
    np.testing.assert_allclose(u2["w"], v2["w"] * 0.5, rtol=1e-6)

    set_learning_rate(st, 5e-4)
    assert get_learning_rate(st) == pytest.approx(5e-4)
