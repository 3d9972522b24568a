"""Headline benchmark: KPCN+manifold training step throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config mirrors the reference's training anchor (spp 8, batch 8,
128x128 patches, KPCN + 2x PathNet + FeatureMSE manifold loss;
reference README.md:43-56, train_kpcn.py:358-381).

The reference repo publishes no speed numbers (see BASELINE.md);
``vs_baseline`` is measured against the driver's north-star target of
<= 50% of an estimated A100 PyTorch step time for this config
(KPCN fwd/bwd + 2 PathNet fwd/bwd + Halide 21x21 kernel apply).
vs_baseline = target_step_time / measured_step_time (>1 = beating it).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# Estimated A100 PyTorch step time for the reference config (no
# published numbers exist; estimate from op-level costs of the torch/
# Halide stack). The north-star target is 50% of it.
ESTIMATED_A100_STEP_MS = 60.0
TARGET_STEP_MS = 0.5 * ESTIMATED_A100_STEP_MS

BATCH = 8
PATCH = 128
SPP = 8
WARMUP = 3
ITERS = 20
HOST_ROUNDTRIP_S = 0.035   # measured axon-tunnel readback latency


def _fail_json(reason: str) -> None:
    """Emit ONE parseable JSON line and exit non-zero.

    Round-3 lesson: when the axon relay is down, backend init either
    hangs forever or raises mid-benchmark; the driver then records a
    raw traceback (BENCH_r03 rc=1, no parseable line). Always print
    the one-line JSON contract, with an ``error`` field, before
    exiting."""
    print(
        json.dumps(
            {
                "metric": "kpcn_manifold_train_mpix_per_sec_per_chip",
                "value": 0.0,
                "unit": "MP/s",
                "vs_baseline": 0.0,
                "error": reason,
            }
        ),
        flush=True,
    )
    raise SystemExit(1)


def _sibling_chip_holders() -> list[str]:
    """Other python processes that may hold the single axon chip claim.

    Round-4 lesson: a leftover training process held the chip and the
    driver's bench hung at backend init for 180 s, with an error string
    blaming the relay. Name the actual suspect in the JSON error so
    the failure is diagnosable from the artifact alone."""
    # exclude our own ancestry: wrapper shells / timeout(1) carry
    # "python bench.py" in their cmdline and would self-flag (r5: a
    # trap-guarded retry blamed its own bash -c / timeout wrappers)
    skip = set()
    pid = os.getpid()
    while pid > 1:
        skip.add(str(pid))
        try:
            with open(f"/proc/{pid}/status") as f:
                pid = int(next(l for l in f if l.startswith("PPid"))
                          .split()[1])
        except (OSError, StopIteration, ValueError):
            break
    out = []
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or pid in skip:
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read().replace(b"\x00", b" ").decode(
                        errors="replace").strip()
            except OSError:
                continue
            if "python" not in cmd or "tpu_init" in cmd:
                continue
            # heuristically: anything running repo code or jax work
            if any(t in cmd for t in ("wcmc", "train_", "experiment",
                                      "bench", "jax", "eval_")):
                out.append(f"pid {pid}: {cmd[:120]}")
    except OSError:
        pass
    return out


def _probe_backend(timeout_s: float = 480.0, attempts: int = 2) -> None:
    """Bounded-time device probe in a subprocess.

    Initializing the axon backend while the relay is down hangs
    indefinitely (no error); a killable child is the only safe way to
    find out. A clean child exit releases the chip claim.

    The bound must comfortably exceed a *healthy* first op: after the
    r5 tunnel degradation the first device op on a recovered relay
    measures 130-170 s with occasional >480 s stragglers (it was ~15 s
    earlier in the round), and a 180 s bound produced a false "relay
    down" red on a working chip. A single retry covers the observed
    flaky-window pattern (one probe hangs, the next succeeds)."""
    code = (
        "import jax, jax.numpy as jnp; "
        "print(float(jnp.sum(jnp.ones((4,)))), jax.default_backend())"
    )
    last_reason = "?"
    for attempt in range(attempts):
        try:
            res = subprocess.run(
                [sys.executable, "-c", code],
                env=dict(os.environ),
                timeout=timeout_s,
                capture_output=True,
            )
        except subprocess.TimeoutExpired:
            holders = _sibling_chip_holders()
            if holders:
                last_reason = (
                    f"backend init unresponsive after {timeout_s:.0f}s — "
                    "chip likely held by sibling process(es): "
                    + "; ".join(holders[:3])
                )
            else:
                last_reason = (
                    f"backend init unresponsive after {timeout_s:.0f}s "
                    "x{} (no chip-holding sibling found — axon relay "
                    "down or degraded?)".format(attempt + 1)
                )
            time.sleep(20)
            continue
        if res.returncode != 0:
            tail = res.stderr.decode(errors="replace").strip().splitlines()
            _fail_json("backend init failed: " + (tail[-1] if tail else "?"))
        return
    _fail_json(last_reason)


def main():
    _probe_backend()
    import jax

    on_tpu = jax.default_backend() in ("tpu", "axon")

    from wcmc_tpu.data.batches import synthetic_batch
    from wcmc_tpu.train.factory import TrainConfig, init_interfaces

    cfg = TrainConfig(
        base_model="kpcn",
        use_llpm_buf=True,
        manif_learn=True,
        manif_loss="FMSE",
        finite_check_every=10**9,
    )
    if not on_tpu:  # keep a CPU smoke-benchmark cheap
        cfg.kpcn_ksize = 5

    iface = init_interfaces(cfg)[0]
    rng = np.random.default_rng(0)
    batch = synthetic_batch(
        rng, "kpcn", batch_size=BATCH, patch=PATCH, spp=SPP,
        use_llpm_buf=True,
    )
    iface.to_train_mode()
    import jax.numpy as jnp

    # Chain ITERS steps inside one jit: measures pure device throughput
    # (per-step host dispatch through the axon tunnel would otherwise
    # dominate; a real TPU VM training loop pipelines it away).
    raw_step = iface._make_train_step()
    key = jax.random.PRNGKey(0)

    @jax.jit
    def chained(states, n):
        def body(i, s):
            new_s, _ = raw_step(s, batch, jax.random.fold_in(key, i))
            return new_s
        return jax.lax.fori_loop(0, n, body, states)

    def readback(states):
        # NOTE: on the tunneled axon platform block_until_ready can
        # return before device work completes; a host readback is the
        # only reliable sync.
        leaf = jax.tree_util.tree_leaves(states["dncnn"].params)[0]
        return float(jnp.sum(leaf))

    readback(chained(iface.states, WARMUP))

    t0 = time.perf_counter()
    readback(chained(iface.states, ITERS))
    dt = (time.perf_counter() - t0 - HOST_ROUNDTRIP_S) / ITERS

    mpix = BATCH * PATCH * PATCH / 1e6
    value = mpix / dt
    print(
        json.dumps(
            {
                "metric": "kpcn_manifold_train_mpix_per_sec_per_chip",
                "value": round(value, 3),
                "unit": "MP/s",
                "vs_baseline": round((TARGET_STEP_MS / 1e3) / dt, 3),
                "step_ms": round(dt * 1e3, 2),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except BaseException as e:  # relay died mid-benchmark, OOM, ...
        _fail_json(f"{type(e).__name__}: {e}")
