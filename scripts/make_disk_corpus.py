"""Build the round-3 on-disk synthetic corpus (shared by the
disk-backed CLI training proof and the checkpoint eval sweep).

Layout: <root>/{train,val,test}/{gt,input}/sceneN.npy + offline
preprocessing caches for every mode (reference cache contract,
support/datasets.py:618-620).  Run with JAX_PLATFORMS=cpu; this is a
host-only job (~20 s/scene on this one-core box).

Usage: python scripts/make_disk_corpus.py [--train 48] [--size 256]
"""
import sys, os, argparse, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

ROOT = os.environ.get("WCMC_R3_DATA", "/tmp/wcmc_data/r3corpus")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--train", type=int, default=48)
    ap.add_argument("--val", type=int, default=6)
    ap.add_argument("--test", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--spp", type=int, default=8)
    args = ap.parse_args()

    from scripts.make_synthetic_dataset import build  # type: ignore
    from wcmc_tpu.data.dataset import offline_preprocess

    t0 = time.time()
    if not os.path.isfile(
            os.path.join(ROOT, "train", "input",
                         f"scene{args.train - 1}.npy")):
        build(ROOT, n_train=args.train, n_val=args.val, n_test=args.test,
              size=args.size, spp=args.spp, test_extra_parts=1, seed=42)
        print(f"raw scenes in {time.time() - t0:.0f}s", flush=True)
    for mode in ("train", "val", "test"):
        offline_preprocess(ROOT, mode=mode, spp=args.spp,
                           test_spps=(4, args.spp))
        print(f"preprocessed {mode} ({time.time() - t0:.0f}s)", flush=True)
    n_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(ROOT) for f in fs)
    print(f"corpus ready: {n_bytes / 1e9:.1f} GB at {ROOT}", flush=True)


if __name__ == "__main__":
    main()
