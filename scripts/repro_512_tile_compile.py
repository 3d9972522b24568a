"""Minimal repro: pathological XLA compile time for 512x512 KPCN tiles.

Round-3 finding (CLAUDE.md): full-frame inference at 512-px square
tiles takes >9 minutes to compile through the axon remote-compile
tunnel, while 256-px tiles compile in tens of seconds and are also the
measured throughput sweet spot.  The suspect is the 21x21 kernel-apply
unfold at 484x484 valid output (484*484*441 gather lattice) crossing
an XLA fusion-size cliff, not the tunnel itself (the HLO text scales
linearly; the compile does not).

Usage:
  python scripts/repro_512_tile_compile.py [--tile 256] [--timeout 900]

Times AOT lowering+compile only (no execution) for a single vanilla
KPCN forward at the given tile size, printing one line per stage.
``evaluate.denoise`` clamps square tiles >384 px for this reason
(WCMC_ALLOW_LARGE_TILES=1 overrides).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax

    from wcmc_tpu.data.batches import synthetic_batch
    from wcmc_tpu.train.factory import TrainConfig, init_interfaces

    iface = init_interfaces(TrainConfig(base_model="kpcn"))[0]
    model = iface.models["dncnn"]
    params = iface.states["dncnn"].params

    rng = np.random.default_rng(0)
    batch = synthetic_batch(
        rng, "kpcn", batch_size=args.batch, patch=args.tile, spp=4
    )
    net_batch = {k: v for k, v in batch.items() if k.startswith("kpcn_")}

    fwd = jax.jit(lambda p, b: model.apply({"params": p}, b)["radiance"])

    t0 = time.perf_counter()
    lowered = fwd.lower(params, net_batch)
    t1 = time.perf_counter()
    print(f"tile={args.tile}: lowered in {t1 - t0:.1f}s "
          f"(HLO {len(lowered.as_text()) / 1e6:.2f} MB)", flush=True)
    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(f"tile={args.tile}: compiled in {t2 - t1:.1f}s "
          f"({compiled.cost_analysis() and 'cost ok'})", flush=True)


if __name__ == "__main__":
    main()
