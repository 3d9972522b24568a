"""Microbenchmark the fused per-pixel MLP at PathNet model shapes,
sweeping the row-tile size. Run on the TPU."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib

import numpy as np
import jax
import jax.numpy as jnp

mf = importlib.import_module("wcmc_tpu.ops.mlp_fused")

N = 64 * 128 * 128
CASES = [
    ("embed", (36, 64, 64, 64), ("relu", "relu", "linear"), False),
    ("final", (128, 128, 3), ("relu", "relu"), True),
]


def timeit(f, *args, n=100):
    # thread the carry through a WEIGHT (negligible traffic) so the
    # loop body cannot be hoisted as loop-invariant
    @jax.jit
    def run(s0, *a):
        def body(i, s):
            outs = f(s, *a)
            return sum(jnp.sum(o) * 1e-30
                       for o in jax.tree_util.tree_leaves(outs)) + s0
        return jax.lax.fori_loop(0, n, body, s0)
    float(run(jnp.float32(0.0), *args))
    t0 = time.perf_counter()
    float(run(jnp.float32(0.0), *args))
    return (time.perf_counter() - t0 - 0.035) / n


rng = np.random.default_rng(0)
for name, dims, acts, cdx in CASES:
    ws = [jnp.asarray(rng.standard_normal((a, b)).astype(np.float32)) * 0.3
          for a, b in zip(dims[:-1], dims[1:])]
    bs = [jnp.asarray(rng.standard_normal((b,)).astype(np.float32)) * 0.1
          for b in dims[1:]]
    x = jnp.asarray(rng.standard_normal((N, dims[0])).astype(np.float32)
                    ).astype(jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((N, dims[-1])).astype(np.float32)
                    ).astype(jnp.bfloat16)
    fwd_bytes = N * (dims[0] + dims[-1]) * 2
    bwd_bytes = N * (dims[0] + dims[-1] + (dims[0] if cdx else 0)) * 2
    for tr in (1024, 2048, 4096):
        mf._TILE_ROWS = tr
        dt_f = timeit(
            lambda s, xx: mf._mlp_fwd_pallas(
                xx, [ws[0] + s] + ws[1:], bs, acts), x)
        dt_b = timeit(
            lambda s, xx, gg: mf._mlp_bwd_pallas(
                xx, gg, [ws[0] + s] + ws[1:], bs, acts, cdx)[1],
            x, g,
        )
        print(f"{name} tr={tr:5d}: fwd {dt_f*1e3:6.3f} ms "
              f"({fwd_bytes/dt_f/1e9:5.0f} GB/s)  "
              f"bwd {dt_b*1e3:6.3f} ms ({bwd_bytes/dt_b/1e9:5.0f} GB/s)",
              flush=True)
