"""Sweep tile sizes for the dual-width PathNet fused kernels at bench
shapes (B=8, S=8, HW=128^2, dual channels 128/256)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib

import numpy as np
import jax
import jax.numpy as jnp

pf = importlib.import_module("wcmc_tpu.ops.pathnet_fused")

B, S, HW = 8, 8, 128 * 128
rng = np.random.default_rng(0)


def params(dims):
    ws = [jnp.asarray(rng.standard_normal((a, b)).astype(np.float32)) * 0.2
          for a, b in zip(dims[:-1], dims[1:])]
    bs = [jnp.asarray(rng.standard_normal((b,)).astype(np.float32)) * 0.1
          for b in dims[1:]]
    return ws, bs


def timeit(f, *args, n=100):
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


x = jnp.asarray(rng.standard_normal((B, S, HW, 36)).astype(np.float32)
                ).astype(jnp.bfloat16)
ws_e, bs_e = params((36, 128, 128, 128))
ge = jnp.asarray(rng.standard_normal((B, S, HW, 128)).astype(np.float32)
                 ).astype(jnp.bfloat16)
gm = jnp.asarray(rng.standard_normal((B, HW, 128)).astype(np.float32))
ACTS_E = ("relu", "relu", "linear")

for tile in (1024, 2048, 4096, 8192):
    pf._EMBED_TILE = tile
    try:
        f = timeit(lambda s, xx: pf._embed_fwd_pallas(
            xx, [ws_e[0] + s] + ws_e[1:], bs_e, ACTS_E), x)
        b_ = timeit(lambda s, xx: pf._embed_bwd_pallas(
            xx, ge, gm, [ws_e[0] + s] + ws_e[1:], bs_e, ACTS_E), x)
        print(f"embed tile={tile:5d}: fwd {f*1e3:6.3f} ms  bwd {b_*1e3:6.3f} ms",
              flush=True)
    except Exception as exc:
        print(f"embed tile={tile:5d}: FAIL {str(exc)[:90]}", flush=True)

e = ge
ctx = jnp.asarray(rng.standard_normal((B, HW, 128)).astype(np.float32))
ws_h, bs_h = params((256, 256, 6))
g = jnp.asarray(rng.standard_normal((B, S, HW, 6)).astype(np.float32))
gs = jnp.asarray(rng.standard_normal((B, HW, 6)).astype(np.float32))
ACTS_H = ("relu", "relu")

for tile in (512, 1024, 2048, 4096):
    pf._HEAD_TILE = tile
    try:
        f = timeit(lambda s, ee: pf._head_fwd_pallas(
            ee, ctx, [ws_h[0] + s, ws_h[1]], bs_h, ACTS_H, True,
            jnp.float32), e)
        b_ = timeit(lambda s, ee: pf._head_bwd_pallas(
            ee, ctx, g, gs, gs, [ws_h[0] + s, ws_h[1]], bs_h, ACTS_H, True),
            e)
        print(f"head  tile={tile:5d}: fwd {f*1e3:6.3f} ms  bwd {b_*1e3:6.3f} ms",
              flush=True)
    except Exception as exc:
        print(f"head  tile={tile:5d}: FAIL {str(exc)[:90]}", flush=True)
