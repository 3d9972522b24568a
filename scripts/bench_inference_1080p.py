"""Headline inference benchmark: full-frame 1080p tiled KPCN denoising
(BASELINE.json config 5).

Run with ``--prepare`` once (forces the CPU backend: shipping the 3.4 GB
raw dump through the axon tunnel for preprocessing is slower than host
compute), then without flags for the TPU timing run.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--prepare" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import time

import numpy as np

from wcmc_tpu import evaluate
from wcmc_tpu.data.dataset import offline_preprocess
from wcmc_tpu.data.full_image import FullImageDataset
from wcmc_tpu.data.synthetic import synthetic_ground_truth, synthetic_raw_sample
from wcmc_tpu.train.factory import TrainConfig, init_interfaces

H, W, SPP = 1080, 1920, 4
ROOT = "/tmp/bench1080"


def main():
    t0 = time.time()
    if not os.path.isfile(f"{ROOT}/test/input/s_kpcn_{SPP}.npy"):
        os.makedirs(f"{ROOT}/test/gt", exist_ok=True)
        os.makedirs(f"{ROOT}/test/input", exist_ok=True)
        rng = np.random.default_rng(0)
        gt = synthetic_ground_truth(rng, H, W)
        raw, _ = synthetic_raw_sample(rng, H, W, SPP, gt=gt)
        np.save(f"{ROOT}/test/gt/s.npy", gt)
        np.save(f"{ROOT}/test/input/s.npy", raw)
        del raw
        offline_preprocess(ROOT, mode="test", spp=SPP, test_spps=(SPP,))
    print(f"data ready in {time.time()-t0:.0f}s", flush=True)
    if "--prepare" in sys.argv:
        return

    # default: the measured v5e sweet spot (256-px tiles, bs 8; the
    # honest sweep: 256/8 416 ms, 128/8 628, 320/8 464, 384/4 515,
    # full-width bands 826 — XLA conv throughput is ~100-130 TF/s at
    # every tile size, so halo redundancy sets the ranking until tile
    # shapes leave the conv emitter's comfort zone)
    tile_h = tile_w = 256
    bs = 8
    if "--tile128" in sys.argv:
        tile_h = tile_w = None
    if "--tile_h" in sys.argv:
        # full-width bands. batch-1 huge bands (636 rows) measured
        # PATHOLOGICAL (413 ms/band — XLA's conv emitter drops to
        # ~10 TF/s on batch-1 huge-spatial shapes); batched shorter
        # bands (--tile_h 256 --bs 3: 6 bands/frame, 78% useful rows
        # vs 61% useful pixels for 256x256 tiles) are the r4 probe
        tile_h = int(sys.argv[sys.argv.index("--tile_h") + 1])
        tile_w = 1984     # full frame width + 2*PAD
        bs = 1
    if "--tile" in sys.argv:
        tile_h = tile_w = int(sys.argv[sys.argv.index("--tile") + 1])
    if "--tile_hw" in sys.argv:
        # rectangular tiles (r5 probe: modest-aspect rectangles keep
        # XLA's conv emitter in its comfort zone while cutting halo
        # redundancy vs squares — useful fraction (stride_h/tile_h) *
        # (stride_w/tile_w) rises with tile_w at fixed conv speed)
        i = sys.argv.index("--tile_hw")
        tile_h = int(sys.argv[i + 1])
        tile_w = int(sys.argv[i + 2])
    if "--bs" in sys.argv:
        bs = int(sys.argv[sys.argv.index("--bs") + 1])
    iface = init_interfaces(
        TrainConfig(base_model="kpcn", finite_check_every=10**9)
    )[0]
    ds = FullImageDataset(f"{ROOT}/test/input/s.npy", SPP, "kpcn",
                          tile_h=tile_h, tile_w=tile_w)
    print(f"frame {ds.orig_h}x{ds.orig_w} -> padded {ds.h}x{ds.w}, "
          f"{len(ds)} tiles of {ds.tile_h}x{ds.tile_w}", flush=True)

    if "--device" in sys.argv:
        # Device-side projection: chain the jitted val step over ONE
        # resident tile batch (wall time here is axon-tunnel-bound,
        # ~6 MB/s uploads — meaningless for a real TPU-VM with PCIe
        # DMA; see CLAUDE.md).
        import jax
        import jax.numpy as jnp

        # Upload ONE tile and replicate it on device: the throughput
        # measurement is data-independent, and shipping bs real tiles
        # through the ~6-21 MB/s axon tunnel (~20 MB/tile) stalled the
        # bs-16 probe for 20+ min before the chip ever ran.
        tile0 = {k: jnp.asarray(v) for k, v in ds[0][0].items()}
        # jnp.tile materializes bs independent copies in HBM (a
        # broadcast view would alias one tile and understate bandwidth)
        batch = {
            k: jnp.tile(v[None], (bs,) + (1,) * v.ndim)
            for k, v in tile0.items()
        }
        val = iface._make_val_step()
        states = iface.states

        # batch/states enter as ARGUMENTS: closing over them would
        # embed hundreds of MB of band data as HLO constants, which
        # the axon remote-compile tunnel rejects (HTTP 413)
        @jax.jit
        def chained(n, states, batch):
            def body(i, acc):
                # thread the carry through EVERY model input so no
                # branch of the loop body is loop-invariant (r2's
                # harness only perturbed kpcn_diffuse_in, so XLA
                # hoisted the whole specular branch out of the loop
                # and the frame numbers were ~2x optimistic)
                b2 = {
                    k: v + acc * 1e-30 if jnp.issubdtype(
                        v.dtype, jnp.floating) else v
                    for k, v in batch.items()
                }
                rad, _, _ = val(states, b2)
                return jnp.sum(rad) * 1e-30
            import jax.lax as lax
            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        _jitted = chained
        chained = lambda n: _jitted(jnp.int32(n), states, batch)  # noqa: E731
        float(chained(3))
        n = 30 if bs == 8 else 10
        t0 = time.time()
        float(chained(n))
        per_batch = (time.time() - t0 - 0.035) / n
        n_batches = -(-len(ds) // bs)
        frame_s = per_batch * n_batches
        mpix = ds.orig_h * ds.orig_w / 1e6
        print(f"device-side: {per_batch*1e3:.1f} ms/{bs}-tile batch x "
              f"{n_batches} batches -> {frame_s*1e3:.0f} ms/frame "
              f"({mpix/frame_s:.1f} MP/s/chip)", flush=True)
        return

    # warm-up (compile)
    out, _, dt = evaluate.inference(iface, ds, batch_size=bs)
    print(f"first pass (incl. compile): {dt:.1f}s", flush=True)
    out, _, dt = evaluate.inference(iface, ds, batch_size=bs)
    mpix = ds.orig_h * ds.orig_w / 1e6
    print(f"1080p tiled KPCN inference: {dt*1e3:.0f} ms "
          f"-> {mpix/dt:.1f} MP/s/chip (wall; tunnel-bound on this box)",
          flush=True)


if __name__ == "__main__":
    main()
