"""Tall-tile inference geometry probe (r5 session 3).

The one geometry family left open by the r5 session-2 probes: tall
tiles (H > 256 at W = 256).  Session 2 established that the XLA conv
emitter draws its parallelism from ROWS (shrinking H at wide W makes
the wide-conv pathology *worse*), so growing H should keep per-pixel
conv speed while cutting painted pixels via fewer row halos:

  tile        row tiles  tiles/frame  painted MP  projected @106 ns/px
  256x256     6          60           3.93        417 ms (incumbent)
  328x256     4          40           3.36        356 ms
  400x256     3          30           3.07        326 ms
  568x256     2          20           2.91        309 ms
  1080x256    1          10           2.76        293 ms

(1080x1920 frame, stride = tile - 56 exact-margin KPCN tiling, 10
column tiles at W=256.)  If per-px speed holds to the tallest tile the
<=300 ms/frame target falls; if it degrades the probe localizes where.

Also measures the incumbent 256x256 with params cast to bf16 (weights
are already *computed* in bf16 via the flax dtype cast; serving them
bf16 removes the per-call f32->bf16 cast and halves weight HBM reads).

Single process: backend init (130-480 s post-recovery) is paid once;
each geometry costs one remote compile (~2-4 min healthy tunnel).

Usage: timeout 3600 python scripts/probe_tall_tiles.py [--quick]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    # env alone is sometimes ignored on this box (CLAUDE.md
    # "Environment facts") — force via jax.config before any device use
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

H, W, SPP = 1080, 1920, 4
ROOT = os.environ.get("WCMC_PROBE_ROOT", "/tmp/bench1080")
BS = int(os.environ.get("WCMC_PROBE_BS", "8"))


def measure(iface, ds, bs, n_iter, states=None):
    """Device-side chained val-step timing over one replicated
    resident tile batch (same harness as bench_inference_1080p.py
    --device, incl. the carry-through-every-input guard against
    loop-invariant hoisting)."""
    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    tile0 = {k: jnp.asarray(v) for k, v in ds[0][0].items()}
    batch = {
        k: jnp.tile(v[None], (bs,) + (1,) * v.ndim)
        for k, v in tile0.items()
    }
    val = iface._make_val_step()
    if states is None:
        states = iface.states

    @jax.jit
    def chained(n, states, batch):
        def body(i, acc):
            b2 = {
                k: v + acc * 1e-30 if jnp.issubdtype(
                    v.dtype, jnp.floating) else v
                for k, v in batch.items()
            }
            rad, _, _ = val(states, b2)
            # f32 cast keeps the carry dtype stable when bf16-served
            # params make the radiance bf16
            return jnp.sum(rad).astype(jnp.float32) * 1e-30

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(chained(jnp.int32(3), states, batch))   # compile + warm
    t0 = time.time()
    float(chained(jnp.int32(n_iter), states, batch))
    per_batch = (time.time() - t0 - 0.035) / n_iter
    n_batches = -(-len(ds) // bs)
    frame_s = per_batch * n_batches
    painted = len(ds) * ds.tile_h * ds.tile_w / 1e6
    return per_batch, n_batches, frame_s, painted


def main():
    from wcmc_tpu.data.full_image import FullImageDataset
    from wcmc_tpu.train.factory import TrainConfig, init_interfaces

    quick = "--quick" in sys.argv
    assert os.path.isfile(f"{ROOT}/test/input/s.npy"), (
        "run scripts/bench_inference_1080p.py --prepare first")

    iface = init_interfaces(
        TrainConfig(base_model="kpcn", finite_check_every=10**9)
    )[0]

    geoms = [(256, 256), (328, 256), (400, 256), (568, 256), (1080, 256)]
    if quick:
        geoms = [(256, 256), (400, 256)]
    if os.environ.get("WCMC_PROBE_GEOMS"):  # "256x256,400x256"
        geoms = [tuple(int(v) for v in g.split("x"))
                 for g in os.environ["WCMC_PROBE_GEOMS"].split(",")]
    n_iter = int(os.environ.get("WCMC_PROBE_ITERS", "10" if quick else "30"))

    os.environ["WCMC_ALLOW_LARGE_TILES"] = "1"  # tall, not wide: allowed
    results = []
    for th, tw in geoms:
        ds = FullImageDataset(f"{ROOT}/test/input/s.npy", SPP, "kpcn",
                              tile_h=th, tile_w=tw)
        t0 = time.time()
        per_batch, n_batches, frame_s, painted = measure(
            iface, ds, BS, n_iter)
        mpix = ds.orig_h * ds.orig_w / 1e6
        ns_px = per_batch / (BS * th * tw) * 1e9
        print(f"[{th}x{tw}] {len(ds)} tiles, painted {painted:.2f} MP: "
              f"{per_batch*1e3:.1f} ms/{BS}-tile batch x {n_batches} "
              f"-> {frame_s*1e3:.0f} ms/frame ({mpix/frame_s:.1f} MP/s, "
              f"{ns_px:.0f} ns/painted px; compile+measure "
              f"{time.time()-t0:.0f}s)", flush=True)
        results.append((th, tw, frame_s))

    # bf16-served params at the incumbent geometry
    import jax
    import jax.numpy as jnp

    def to_bf16(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(jnp.bfloat16)
        return x

    states16 = {
        n: type(s)(params=jax.tree_util.tree_map(to_bf16, s.params),
                   opt_state=s.opt_state)
        for n, s in iface.states.items()
    }
    ds = FullImageDataset(f"{ROOT}/test/input/s.npy", SPP, "kpcn",
                          tile_h=256, tile_w=256)
    per_batch, n_batches, frame_s, _ = measure(
        iface, ds, BS, n_iter, states=states16)
    print(f"[256x256 bf16-params] {per_batch*1e3:.1f} ms/batch -> "
          f"{frame_s*1e3:.0f} ms/frame", flush=True)

    best = min(results, key=lambda r: r[2])
    print(f"BEST: {best[0]}x{best[1]} at {best[2]*1e3:.0f} ms/frame",
          flush=True)


if __name__ == "__main__":
    main()
