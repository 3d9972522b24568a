"""Generate a synthetic OptaGen-layout dataset tree for tests/benchmarks.

Writes ``<root>/{train,val,test}/{gt,input}/<scene>.npy`` with the
104-channel per-sample layout plus extra-spp part files
(``<scene>_1.npy`` ...) for test scenes, mirroring the on-disk contract
of the real renderer output (reference support/datasets.py:618-620,
1302-1317).
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

from wcmc_tpu.data.synthetic import synthetic_ground_truth, synthetic_raw_sample


def build(root, n_train=2, n_val=1, n_test=1, size=256, spp=8,
          test_extra_parts=1, seed=0, nan_fraction=1e-5):
    rng = np.random.default_rng(seed)
    for mode, count in (("train", n_train), ("val", n_val), ("test", n_test)):
        gt_dir = os.path.join(root, mode, "gt")
        in_dir = os.path.join(root, mode, "input")
        os.makedirs(gt_dir, exist_ok=True)
        os.makedirs(in_dir, exist_ok=True)
        for i in range(count):
            scene = f"scene{i}"
            gt = synthetic_ground_truth(rng, size, size)
            raw, _ = synthetic_raw_sample(rng, size, size, spp, gt=gt,
                                          nan_fraction=nan_fraction)
            np.save(os.path.join(gt_dir, scene + ".npy"), gt)
            np.save(os.path.join(in_dir, scene + ".npy"), raw)
            if mode == "test":
                for p in range(1, test_extra_parts + 1):
                    extra, _ = synthetic_raw_sample(rng, size, size, spp, gt=gt)
                    np.save(
                        os.path.join(in_dir, f"{scene}_{p}.npy"), extra
                    )
    print(f"synthetic dataset written to {root}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--n_train", type=int, default=2)
    ap.add_argument("--n_val", type=int, default=1)
    ap.add_argument("--n_test", type=int, default=1)
    ap.add_argument("--nan_fraction", type=float, default=1e-5)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    build(args.root, args.n_train, args.n_val, args.n_test, args.size,
          args.spp, seed=args.seed, nan_fraction=args.nan_fraction)
