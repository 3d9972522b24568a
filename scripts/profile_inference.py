"""Capture a TPU profile + HLO of the tiled-inference val step and
attribute device time to op families (scripts/profile_families.py).

The device-side 1080p benchmark runs ~110 TF/s effective against a
~190 TF/s fwd-only conv microbench — this measures where the per-batch
time actually goes (convs vs softmax/kernel-apply vs layout glue) at
the production tile geometry.

Usage:  python scripts/profile_inference.py [tile_h tile_w bs]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob
import time

import numpy as np

TRACE_DIR = "/tmp/jax_trace_inference"
HLO_PATH = "/tmp/inference_hlo.txt"


def main():
    tile = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (256, 256)
    bs = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp

    from wcmc_tpu.train.factory import TrainConfig, init_interfaces
    from wcmc_tpu.data.full_image import FullImageDataset

    iface = init_interfaces(
        TrainConfig(base_model="kpcn", finite_check_every=10**9)
    )[0]
    ds = FullImageDataset("/tmp/bench1080/test/input/s.npy", 4, "kpcn",
                          tile_h=tile[0], tile_w=tile[1])
    tile0 = {k: jnp.asarray(v) for k, v in ds[0][0].items()}
    batch = {k: jnp.tile(v[None], (bs,) + (1,) * v.ndim)
             for k, v in tile0.items()}

    val = jax.jit(iface._make_val_step())
    states = iface.states

    # warm-up/compile, then a host-readback-synced hot run
    for _ in range(2):
        rad, _, _ = val(states, batch)
    float(jnp.sum(rad))

    t0 = time.time()
    n = 5
    for _ in range(n):
        rad, _, _ = val(states, batch)
    float(jnp.sum(rad))
    print(f"hot val step: {(time.time() - t0 - 0.035) / n * 1e3:.1f} "
          f"ms/{bs}-tile batch (wall, incl. per-call dispatch)", flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        rad, _, _ = val(states, batch)
    float(jnp.sum(rad))
    jax.profiler.stop_trace()

    open(HLO_PATH, "w").write(
        val.lower(states, batch).compile().as_text()
    )

    from profile_families import family_times

    fams, unattributed, _ = family_times(TRACE_DIR, HLO_PATH)
    total = sum(fams.values())
    print(f"total attributed device time: {total:.2f} ms/step")
    for fam, ms in sorted(fams.items(), key=lambda kv: -kv[1]):
        print(f"  {ms:7.3f} ms/step  {fam}")
    big = {k: v for k, v in unattributed.items() if v > 0.05}
    if big:
        print("largest unattributed:")
        for k, v in sorted(big.items(), key=lambda kv: -kv[1])[:10]:
            print(f"  {v:7.3f} ms/step  {k}")
    # per-instruction convolution detail: which layer shapes are slow
    _, _, det = family_times(TRACE_DIR, HLO_PATH, detail="kpcn_conv_fwd")
    if det:
        print("top kpcn_conv_fwd instructions:")
        for (inst, op), v in sorted(det.items(), key=lambda kv: -kv[1])[:15]:
            print(f"  {v:7.3f} ms/step  {inst:<16} {op}")


if __name__ == "__main__":
    main()
