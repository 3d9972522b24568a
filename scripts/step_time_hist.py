"""Step-time histogram for a CLI training run (VERDICT r3 item 4).

Reads the per-step wall times dumped by the train loop
(``<save>/logs/<model>/step_times_e*.npy``, written under ``--visual``)
and reports whether the disk loader + prefetcher sustain the benched
device step rate: percentiles, an ASCII histogram, and a CSV of the
bin counts next to the inputs.

Usage:
    python scripts/step_time_hist.py experiments/disk_cli/logs/r4_disk_fsme \
        [--device_ms 53.0]
"""
import argparse
import glob
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log_dir")
    ap.add_argument("--device_ms", type=float, default=None,
                    help="benched device-only step time to compare against")
    ap.add_argument("--bins", type=int, default=30)
    args = ap.parse_args()

    fns = sorted(glob.glob(os.path.join(args.log_dir, "step_times_e*.npy")))
    if not fns:
        print(f"no step_times_e*.npy under {args.log_dir}", file=sys.stderr)
        raise SystemExit(1)

    per_epoch = {fn: np.load(fn) for fn in fns}
    # drop each epoch's first tick: it absorbs that epoch's compile /
    # first-dispatch latency and is not a loader-sustain sample
    steady = np.concatenate([v[1:] if len(v) > 1 else v
                             for v in per_epoch.values()])

    pcts = {p: float(np.percentile(steady, p)) for p in (5, 25, 50, 75, 95, 99)}
    mean = float(steady.mean())
    print(f"epochs: {len(per_epoch)}   steps: {steady.size}   "
          f"mean {mean:.1f} ms")
    print("percentiles (ms): "
          + "  ".join(f"p{p}={v:.1f}" for p, v in pcts.items()))
    if args.device_ms:
        over = mean / args.device_ms - 1.0
        print(f"device step {args.device_ms:.1f} ms -> loader overhead "
              f"{over * 100:+.1f}% ({'WITHIN' if over <= 0.10 else 'OVER'} "
              f"the 10% sustain budget)")

    lo, hi = np.percentile(steady, 1), np.percentile(steady, 99)
    hist, edges = np.histogram(steady, bins=args.bins,
                               range=(lo * 0.9, hi * 1.1))
    peak = max(hist.max(), 1)
    for c, e0, e1 in zip(hist, edges[:-1], edges[1:]):
        print(f"{e0:7.1f}-{e1:7.1f} ms | {'#' * int(40 * c / peak):<40} {c}")

    out_csv = os.path.join(args.log_dir, "step_time_hist.csv")
    with open(out_csv, "w") as f:
        f.write("bin_lo_ms,bin_hi_ms,count\n")
        for c, e0, e1 in zip(hist, edges[:-1], edges[1:]):
            f.write(f"{e0:.3f},{e1:.3f},{c}\n")
        f.write(f"# steps={steady.size} mean_ms={mean:.3f} "
                + " ".join(f"p{p}={v:.3f}" for p, v in pcts.items()) + "\n")
    print(f"wrote {out_csv}")


if __name__ == "__main__":
    main()
