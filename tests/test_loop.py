"""Shared train loop: checkpoints, best-model selection, schedulers
(reference train_kpcn.py:90-161 contract)."""

import os
import types

import numpy as np
import pytest

from wcmc_tpu.data.batches import synthetic_batch
from wcmc_tpu.train.factory import TrainConfig, init_interfaces
from wcmc_tpu.train.loop import step_lr, train
from wcmc_tpu.train.state import get_learning_rate


class ListLoader:
    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


def _args(tmp_path, **kw):
    defaults = dict(
        save=str(tmp_path / "weights"), model_name="LOOP_test",
        num_epoch=2, start_epoch=0, val_epoch=1, not_save=False,
        desc="loop test", visual=False,
    )
    defaults.update(kw)
    return types.SimpleNamespace(**defaults)


def test_step_lr_schedule():
    sched = step_lr(1e-3, step_size=3, gamma=0.5)
    # StepLR semantics: lr halves after every 3 completed epochs
    assert sched(0) == pytest.approx(1e-3)
    assert sched(1) == pytest.approx(1e-3)
    assert sched(2) == pytest.approx(5e-4)
    assert sched(5) == pytest.approx(2.5e-4)


def test_train_loop_checkpoints_and_best(tmp_path, rng):
    cfg = TrainConfig(base_model="kpcn", kpcn_ksize=5, finite_check_every=1,
                      compute_dtype="float32")
    iface = init_interfaces(cfg)[0]
    batch = synthetic_batch(rng, "kpcn", batch_size=2, patch=48, spp=2)
    loaders = {"train": ListLoader([batch]), "val": ListLoader([batch])}
    args = _args(tmp_path)
    params = {}
    train([iface], loaders, params, args, verbose=False)

    wdir = tmp_path / "weights"
    assert (wdir / "latest_LOOP_test.ckpt").is_file()
    assert (wdir / "LOOP_test.ckpt").is_file()     # best saved
    assert iface.best_err < 1e10                   # updated from sentinel

    from wcmc_tpu.train.checkpoint import load_checkpoint

    ck = load_checkpoint(str(wdir / "latest_LOOP_test.ckpt"))
    assert ck["start_epoch"] == 2
    assert "state_dict_dncnn" in ck


def test_train_loop_scheduler_applied(tmp_path, rng):
    cfg = TrainConfig(base_model="kpcn", kpcn_ksize=5, finite_check_every=1,
                      compute_dtype="float32")
    iface = init_interfaces(cfg)[0]
    batch = synthetic_batch(rng, "kpcn", batch_size=2, patch=48, spp=2)
    loaders = {"train": ListLoader([batch]), "val": ListLoader([batch])}
    args = _args(tmp_path, num_epoch=3, model_name="LOOP_sched")
    params = {"sched_dncnn": step_lr(1e-4, step_size=1, gamma=0.1)}
    train([iface], loaders, params, args, verbose=False)
    # after 3 epochs with gamma 0.1/epoch: lr = 1e-4 * 0.1^3
    lr = get_learning_rate(iface.states["dncnn"].opt_state)
    assert lr == pytest.approx(1e-7, rel=1e-3)


def test_device_prefetcher(rng):
    from wcmc_tpu.data.prefetch import DevicePrefetcher

    batches = [
        {"x": rng.random((2, 4, 4, 3)).astype(np.float32)} for _ in range(5)
    ]
    pf = DevicePrefetcher(ListLoader(batches), depth=2)
    out = list(pf)
    assert len(out) == 5
    for a, b in zip(out, batches):
        np.testing.assert_array_equal(np.asarray(a["x"]), b["x"])
    # exceptions from the loader propagate
    class Boom:
        def __len__(self):
            return 1

        def __iter__(self):
            raise RuntimeError("boom")
            yield  # pragma: no cover

    with pytest.raises(RuntimeError, match="boom"):
        list(DevicePrefetcher(Boom()))


def test_train_loop_with_prefetcher(tmp_path, rng):
    from wcmc_tpu.data.prefetch import DevicePrefetcher

    cfg = TrainConfig(base_model="kpcn", kpcn_ksize=5, finite_check_every=1,
                      compute_dtype="float32")
    iface = init_interfaces(cfg)[0]
    batch = synthetic_batch(rng, "kpcn", batch_size=2, patch=48, spp=2)
    host = {k: np.asarray(v) for k, v in batch.items()}
    loaders = {
        "train": DevicePrefetcher(ListLoader([host, host])),
        "val": DevicePrefetcher(ListLoader([host])),
    }
    args = _args(tmp_path, model_name="LOOP_prefetch", num_epoch=1)
    train([iface], loaders, {}, args, verbose=False)
    assert iface.best_err < 1e10


def test_train_loop_not_save(tmp_path, rng):
    cfg = TrainConfig(base_model="kpcn", kpcn_ksize=5, finite_check_every=1,
                      compute_dtype="float32")
    iface = init_interfaces(cfg)[0]
    batch = synthetic_batch(rng, "kpcn", batch_size=2, patch=48, spp=2)
    loaders = {"train": ListLoader([batch]), "val": ListLoader([batch])}
    args = _args(tmp_path, not_save=True, model_name="LOOP_nosave",
                 num_epoch=1)
    train([iface], loaders, {}, args, verbose=False)
    assert not (tmp_path / "weights" / "latest_LOOP_nosave.ckpt").exists()


def test_in_flight_window_preserves_results(tmp_path, rng, monkeypatch):
    """The bounded dispatch-runahead window (WCMC_TRAIN_IN_FLIGHT) is a
    sync-only change: training under a 1-deep window must produce the
    same losses as with the window disabled."""
    def run(window):
        monkeypatch.setenv("WCMC_TRAIN_IN_FLIGHT", window)
        cfg = TrainConfig(base_model="kpcn", kpcn_ksize=5,
                          finite_check_every=1, compute_dtype="float32")
        iface = init_interfaces(cfg)[0]
        batch = synthetic_batch(
            np.random.default_rng(7), "kpcn", batch_size=2, patch=48, spp=2)
        loaders = {"train": ListLoader([batch, batch]),
                   "val": ListLoader([batch])}
        args = _args(tmp_path, model_name=f"LOOP_if{window}", num_epoch=1)
        train([iface], loaders, {}, args, verbose=False)
        return iface.best_err

    assert run("0") == pytest.approx(run("1"), rel=1e-6)


def test_step_timer_snapshot_does_not_drain():
    from wcmc_tpu.utils.observability import StepTimer

    t = StepTimer()
    t.tick(); t.tick()
    snap = t.snapshot_ms()
    assert len(snap) == len(t.snapshot_ms())  # snapshot is repeatable
    drained = t.drain_all_ms()
    assert drained == snap                    # same history, then cleared
    assert t.drain_all_ms() == []
