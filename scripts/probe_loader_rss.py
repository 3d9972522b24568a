"""Standalone disk-loader probe: iterate ShuffleLoader over the r3
corpus exactly as train_kpcn.py wires it (no jax, no device) and log
RSS + batch rate, to localize the r4 119-GB blowup (VERDICT r4 #2).

Usage: python scripts/probe_loader_rss.py [--batches 400] [--ppi 256]
"""
import sys, os, time, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1048576
    return -1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=400)
    ap.add_argument("--ppi", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--data", type=str,
                    default="/tmp/wcmc_data/r3corpus")
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--window", type=int, default=4)
    args = ap.parse_args()

    from wcmc_tpu.data.dataset import MSDenoiseDataset, ShuffleLoader

    ds = MSDenoiseDataset(
        args.data, 8, base_model="kpcn", mode="train",
        batch_size=args.batch_size, use_llpm_buf=True,
        patches_per_image=args.ppi,
    )
    loader = ShuffleLoader(ds, args.batch_size, workers=args.workers,
                           window_images=args.window)
    print(f"dataset len {len(ds)}, rss {rss_gb():.2f} GB", flush=True)
    t0 = time.time()
    n = 0
    for epoch in range(100):
        for b in loader:
            n += 1
            if n % 25 == 0:
                dt = (time.time() - t0) / n
                mb = sum(v.nbytes for v in b.values()) / 1e6
                print(f"batch {n}: {dt*1e3:.0f} ms/batch, "
                      f"batch {mb:.0f} MB, rss {rss_gb():.2f} GB",
                      flush=True)
            if n >= args.batches:
                print(f"DONE {n} batches, {(time.time()-t0)/n*1e3:.0f} "
                      f"ms/batch, final rss {rss_gb():.2f} GB", flush=True)
                return


if __name__ == "__main__":
    main()
