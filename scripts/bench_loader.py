"""Input-pipeline throughput microbench: patches/s and MB/s served by
the sequential BatchLoader vs the shuffling multi-worker ShuffleLoader
(VERDICT round-1 item 9).

Run against any preprocessed dataset root:
    python scripts/bench_loader.py [root] [--spp 8] [--batch 8]
"""
import sys, os, time, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from wcmc_tpu.data.dataset import BatchLoader, DenoiseDataset, ShuffleLoader


def drain(loader, max_batches=None):
    n_patches = 0
    n_bytes = 0
    t0 = time.perf_counter()
    for i, batch in enumerate(loader):
        bs = next(iter(batch.values())).shape[0]
        n_patches += bs
        n_bytes += sum(v.nbytes for v in batch.values())
        if max_batches and i + 1 >= max_batches:
            break
    dt = time.perf_counter() - t0
    return n_patches / dt, n_bytes / dt / 1e6, n_patches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", nargs="?", default="/tmp/wcmc_data/conv16")
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ppi", type=int, default=32)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--max_batches", type=int, default=40)
    args = ap.parse_args()

    def make_ds(seed=0):
        return DenoiseDataset(
            args.root, args.spp, base_model="kpcn", mode="train",
            batch_size=args.batch, sampling="random", use_llpm_buf=True,
            patches_per_image=args.ppi, seed=seed,
        )

    seq = BatchLoader(make_ds(), args.batch)
    pps, mbs, n = drain(seq, max_batches=args.max_batches)
    print(f"BatchLoader   (sequential): {pps:7.1f} patches/s "
          f"({mbs:7.0f} MB/s, {n} patches)", flush=True)

    for w in (1, 2, args.workers):
        shuf = ShuffleLoader(make_ds(), args.batch, window_images=4,
                             workers=w)
        pps, mbs, n = drain(shuf, max_batches=args.max_batches)
        print(f"ShuffleLoader (workers={w}):  {pps:7.1f} patches/s "
              f"({mbs:7.0f} MB/s, {n} patches)", flush=True)


if __name__ == "__main__":
    main()
