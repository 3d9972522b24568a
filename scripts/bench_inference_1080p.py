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

    iface = init_interfaces(
        TrainConfig(base_model="kpcn", finite_check_every=10**9)
    )[0]
    ds = FullImageDataset(f"{ROOT}/test/input/s.npy", SPP, "kpcn")
    print(f"frame {ds.orig_h}x{ds.orig_w} -> padded {ds.h}x{ds.w}, "
          f"{len(ds)} tiles", flush=True)

    if "--device" in sys.argv:
        # Device-side projection: chain the jitted val step over ONE
        # resident tile batch (wall time here is axon-tunnel-bound,
        # ~6 MB/s uploads — meaningless for a real TPU-VM with PCIe
        # DMA; see CLAUDE.md).
        import jax
        import jax.numpy as jnp

        batch = {
            k: jnp.asarray(np.stack([ds[i][0][k] for i in range(8)]))
            for k in ds[0][0]
        }
        val = iface._make_val_step()
        states = iface.states

        @jax.jit
        def chained(n):
            def body(i, acc):
                # thread the carry through an input so the loop body
                # cannot be hoisted as loop-invariant
                b2 = dict(batch)
                b2["kpcn_diffuse_in"] = b2["kpcn_diffuse_in"] + acc * 1e-30
                rad, _, _ = val(states, b2)
                return jnp.sum(rad) * 1e-30
            import jax.lax as lax
            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(chained(3))
        n = 30
        t0 = time.time()
        float(chained(n))
        per_batch = (time.time() - t0 - 0.035) / n
        n_batches = -(-len(ds) // 8)
        frame_s = per_batch * n_batches
        mpix = ds.orig_h * ds.orig_w / 1e6
        print(f"device-side: {per_batch*1e3:.1f} ms/8-tile batch x "
              f"{n_batches} batches -> {frame_s*1e3:.0f} ms/frame "
              f"({mpix/frame_s:.1f} MP/s/chip)", flush=True)
        return

    # warm-up (compile)
    out, _, dt = evaluate.inference(iface, ds, batch_size=8)
    print(f"first pass (incl. compile): {dt:.1f}s", flush=True)
    out, _, dt = evaluate.inference(iface, ds, batch_size=8)
    mpix = ds.orig_h * ds.orig_w / 1e6
    print(f"1080p tiled KPCN inference: {dt*1e3:.0f} ms "
          f"-> {mpix/dt:.1f} MP/s/chip (wall; tunnel-bound on this box)",
          flush=True)


if __name__ == "__main__":
    main()
