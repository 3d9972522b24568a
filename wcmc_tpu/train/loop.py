"""Shared epoch training loop.

Counterpart of the reference's ``train / train_epoch_kpcn /
validate_kpcn`` trio (reference train_kpcn.py:37-161), reused verbatim
by all three entry points.  Differences are TPU-shaped: batches are
host numpy (the jitted step moves them), steps pipeline asynchronously
(no per-batch host sync), and checkpoints are framework-neutral
pickles.  Epoch-end LR schedulers are plain callables
``f(epoch) -> {model_name: lr}`` applied to the optimizer states.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Sequence

import numpy as np

from wcmc_tpu.train.checkpoint import save_checkpoint
from wcmc_tpu.train.state import set_learning_rate


def step_lr(base_lr: float, step_size: int, gamma: float):
    """StepLR schedule (reference train_lbmc.py:196: step 3, gamma 0.5)."""

    def schedule(epoch: int) -> float:
        return base_lr * gamma ** ((epoch + 1) // step_size)

    return schedule


def train_epoch(epoch, interfaces, dataloaders, params, args, verbose=True):
    assert "train" in dataloaders
    if verbose:
        print(f"[][] Epoch {epoch}")
    for iface in interfaces:
        iface.to_train_mode()
    writer = params.get("metrics_writer")
    timer = params.setdefault("step_timer", _new_timer())
    # Bound dispatch runahead: each dispatched-but-unexecuted step pins
    # its whole host batch (~120 MB with LLPM paths) in transfer
    # buffers, and the only implicit syncs (loss logging / finite
    # checks) are 50+ steps apart — on the axon tunnel that let the
    # r5 disk-CLI run grow ~2.6 GB/min of staging RSS. Keep a lagged
    # loss scalar per step and read back step N-K before dispatching
    # step N+1 (same pattern as evaluate.inference's in-flight window).
    # K deep keeps the device pipeline full; the readback overlaps the
    # K outstanding steps. 0 disables.
    max_in_flight = int(os.environ.get("WCMC_TRAIN_IN_FLIGHT", "8"))
    lagged: list = []
    n_batches = 0
    for batch in dataloaders["train"]:
        n_batches += 1
        for iface in interfaces:
            iface.preprocess(batch)
            loss_dict = iface.train_batch(batch)
            if max_in_flight > 0 and loss_dict:
                lagged.append(next(iter(loss_dict.values())))
                if len(lagged) > max_in_flight:
                    float(lagged.pop(0))  # host readback = reliable sync
            timer.tick()
            if writer is not None and iface.iters % 50 == 0:
                writer.log(iface.iters, loss_dict, prefix="train/")
                writer.log(iface.iters, {"step_ms": timer.mean_ms}, prefix="perf/")
        if writer is not None and n_batches % 128 == 0:
            # flush partial step times so a truncated run (timeout /
            # kill) still leaves loader-sustain histogram data
            _save_step_times(writer.log_dir, epoch, timer.snapshot_ms())
    if writer is not None:
        # per-step wall times for the loader-sustain histogram; steps
        # pipeline asynchronously so individual ticks measure the
        # host-side issue rate, their sum the true epoch throughput
        _save_step_times(writer.log_dir, epoch, timer.drain_all_ms())
    if verbose:
        for iface in interfaces:
            # normalize by batches actually SERVED: shape-partitioned
            # drop_last (ShuffleLoader over multi-spp data) can yield
            # fewer batches than len(dataloader) predicts
            iface.get_epoch_summary(mode="train", norm=max(n_batches, 1))
        if timer.mean_ms == timer.mean_ms:  # not NaN
            print(f"[][] Mean step time: {timer.mean_ms:.1f} ms")


def _new_timer():
    from wcmc_tpu.utils.observability import StepTimer

    return StepTimer()


def _save_step_times(log_dir, epoch, all_ms):
    if all_ms:
        np.save(
            os.path.join(log_dir, f"step_times_e{epoch}.npy"),
            np.asarray(all_ms, np.float32),
        )


def validate(epoch, interfaces, dataloaders, params, args, verbose=True):
    assert "val" in dataloaders
    if verbose:
        print(f"[][] Validation (epoch {epoch})")
    for iface in interfaces:
        iface.to_eval_mode()
    n_batches = 0
    for batch in dataloaders["val"]:
        n_batches += 1
        for iface in interfaces:
            iface.validate_batch(batch)
    if n_batches == 0:
        # e.g. patches_per_image < batch_size drops every partial batch;
        # an empty validation must not look like a perfect score
        print("[][] WARNING: validation loader produced no batches")
        return [float("inf") for _ in interfaces]
    return [
        iface.get_epoch_summary(mode="eval", norm=n_batches)
        for iface in interfaces
    ]


def train(interfaces, dataloaders, params, args, verbose=True):
    """Full training driver: epochs, latest/best checkpoints, periodic
    validation, epoch-end schedulers."""
    save_dir = getattr(args, "save", "./weights")
    os.makedirs(save_dir, exist_ok=True)
    model_name = getattr(args, "model_name", "model")
    num_epoch = getattr(args, "num_epoch", 1)
    start_epoch = getattr(args, "start_epoch", 0)
    val_epoch = getattr(args, "val_epoch", 1)
    not_save = getattr(args, "not_save", False)
    desc = getattr(args, "desc", "")

    from wcmc_tpu.train.factory import sweep_checkpoint_name

    save_fns = [
        os.path.basename(sweep_checkpoint_name("", model_name, interfaces, i))
        for i in range(len(interfaces))
    ]

    if getattr(args, "visual", False):
        if "metrics_writer" not in params:
            from wcmc_tpu.utils.observability import MetricsWriter

            params["metrics_writer"] = MetricsWriter(
                os.path.join(save_dir, "logs", model_name)
            )
        for iface in interfaces:
            iface.pbuf_dump_dir = os.path.join(
                save_dir, "logs", model_name, "pbuf"
            )

    from wcmc_tpu.utils.observability import maybe_profile

    for epoch in range(start_epoch, num_epoch):
        start_time = time.time()
        profile_dir = (
            getattr(args, "profile_dir", None) if epoch == start_epoch else None
        )
        with maybe_profile(profile_dir):
            train_epoch(epoch, interfaces, dataloaders, params, args, verbose)
        if verbose:
            print(f"[][] Elapsed time: {int(time.time() - start_time)}")

        if not not_save:
            for iface, fn in zip(interfaces, save_fns):
                save_checkpoint(
                    os.path.join(save_dir, "latest_" + fn), iface, epoch,
                    args=args, description=desc,
                )

        if epoch % val_epoch == val_epoch - 1:
            summaries = validate(
                epoch, interfaces, dataloaders, params, args, verbose
            )
            for iface, fn, summary in zip(interfaces, save_fns, summaries):
                if summary < iface.best_err:
                    iface.best_err = summary
                    if not not_save:
                        save_checkpoint(
                            os.path.join(save_dir, fn), iface, epoch,
                            args=args, description=desc,
                        )
                        if verbose:
                            print(f"[][] Model {fn} saved at epoch {epoch}.")
                if verbose:
                    print(
                        f"[][] Model {fn} RelMSE: {summary * 1000:.3f}e-3 \t "
                        f"Best RelMSE: {iface.best_err * 1000:.3f}e-3"
                    )

        # epoch-end schedulers: params['sched_<model>'] -> lr callable
        for key, sched in params.items():
            if not key.startswith("sched_"):
                continue
            name = key[len("sched_"):]
            for iface in interfaces:
                if name in iface.states:
                    set_learning_rate(
                        iface.states[name].opt_state, sched(epoch)
                    )
    if verbose:
        print("[] Training complete!")
