"""Perf-regression guardrail: fail if any op family exceeds its budget.

Captures a fresh trace of the flagship train step on the real TPU,
attributes device time to semantic families (profile_families.py), and
compares against PERF_BUDGET.json with a 20% tolerance — so kernel
work on one path cannot silently regress another fused path (the r1
scatter regression shipped exactly that way).

Usage:  python scripts/check_perf_budget.py   (requires the TPU chip)
Exit 0 = within budget; exit 1 = regression, offending families listed.
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOL = 1.20
TRACE_DIR = "/tmp/perf_budget_trace"
HLO_PATH = "/tmp/perf_budget_hlo.txt"

_DUMP_HLO = r"""
import sys; sys.path.insert(0, %(root)r)
import numpy as np, jax, jax.numpy as jnp
from wcmc_tpu.data.batches import synthetic_batch
from wcmc_tpu.train.factory import TrainConfig, init_interfaces
cfg = TrainConfig(base_model="kpcn", use_llpm_buf=True, manif_learn=True,
                  manif_loss="FMSE", finite_check_every=10**9)
iface = init_interfaces(cfg)[0]
rng = np.random.default_rng(0)
batch = synthetic_batch(rng, "kpcn", batch_size=8, patch=128, spp=8,
                        use_llpm_buf=True)
batch = {k: jnp.asarray(v) for k, v in batch.items()}
txt = iface._train_step.lower(
    iface.states, batch, jax.random.PRNGKey(0)).compile().as_text()
open(%(hlo)r, "w").write(txt)
"""


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    budget = json.load(open(os.path.join(root, "PERF_BUDGET.json")))

    subprocess.run(
        [sys.executable, os.path.join(root, "scripts/profile_step.py"),
         TRACE_DIR],
        check=True, capture_output=True, text=True,
    )
    subprocess.run(
        [sys.executable, "-c", _DUMP_HLO % {"root": root, "hlo": HLO_PATH}],
        check=True, capture_output=True, text=True,
    )

    from profile_families import family_times

    fams, _, _ = family_times(TRACE_DIR, HLO_PATH)
    total = sum(fams.values())
    failures = []
    for fam, limit in budget["families"].items():
        got = fams.get(fam, 0.0)
        status = "OK" if got <= limit * TOL else "REGRESSION"
        print(f"  {fam:16s} {got:7.2f} ms (budget {limit:5.1f}, "
              f"tol {limit * TOL:5.1f})  {status}")
        if got > limit * TOL:
            failures.append((fam, got, limit))
    print(f"  {'TOTAL':16s} {total:7.2f} ms "
          f"(budget {budget['step_ms_total']:.1f})")
    if total > budget["step_ms_total"] * TOL:
        failures.append(("TOTAL", total, budget["step_ms_total"]))

    if failures:
        print("PERF BUDGET EXCEEDED:")
        for fam, got, limit in failures:
            print(f"  {fam}: {got:.2f} ms > {limit:.1f} * {TOL}")
        sys.exit(1)
    print("perf budget OK")


if __name__ == "__main__":
    main()
