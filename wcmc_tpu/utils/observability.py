"""Training observability: metrics writer + profiler hooks.

Replaces the reference's visdom hook (reference train_kpcn.py:332-335)
with a file-backed metrics log (JSONL, TensorBoard-compatible via
tensorboardX when available) and wraps ``jax.profiler`` traces behind
the ``--profile_dir`` CLI flag.
"""

from __future__ import annotations

import contextlib
import json
import os
import time


class MetricsWriter:
    """Append-only JSONL metrics log + optional TensorBoard events."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except ImportError:
                pass

    def log(self, step: int, values: dict, prefix: str = ""):
        rec = {"step": step, "time": time.time()}
        for k, v in values.items():
            key = f"{prefix}{k}"
            rec[key] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(key, float(v), step)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def maybe_profile(profile_dir: str | None):
    """Trace the enclosed block with jax.profiler when a dir is given."""
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock step timing (first-class per SURVEY §5)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._all = []   # full history (floats; ~8 B/step) for the
        #                  loader-sustain histogram (VERDICT r3 item 4)
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            self._all.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    def drain_all_ms(self):
        """Return and clear the full per-step history, in ms."""
        out = [1e3 * t for t in self._all]
        self._all = []
        return out

    def snapshot_ms(self):
        """Full per-step history, in ms, WITHOUT clearing — for
        periodic mid-epoch flushes that must survive a truncated run."""
        return [1e3 * t for t in self._all]

    @property
    def mean_ms(self) -> float:
        if not self._times:
            return float("nan")
        return 1e3 * sum(self._times) / len(self._times)
