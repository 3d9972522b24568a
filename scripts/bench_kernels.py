"""Microbenchmark the Pallas kernels at the exact in-model shapes."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np, jax, jax.numpy as jnp
import importlib

pk = importlib.import_module("wcmc_tpu.ops.pallas_kernels")

K = 21
B, h, ow, c = 8, 72, 72, 3
H, W = h + K - 1, ow + K - 1
rng = np.random.default_rng(0)
buf = jnp.asarray(rng.standard_normal((B, H, W, c)).astype(np.float32))
w = jnp.asarray(rng.standard_normal((B, h, ow, K * K)).astype(np.float32))
x = jnp.asarray(rng.standard_normal((B, h, ow, c)).astype(np.float32))
g = jnp.asarray(rng.standard_normal((B, h, ow, c)).astype(np.float32))

w_bytes = w.size * 4 / 1e6


def timeit(name, f, n=30):
    # chain iterations on device to amortize tunnel latency; feed a
    # scalar through each iteration to keep the op live
    @jax.jit
    def run(s0):
        def body(i, s):
            out = f(s)
            return jnp.sum(out) * 1e-30
        return jax.lax.fori_loop(0, n, body, s0)
    float(run(jnp.float32(0.0)))
    t0 = time.perf_counter()
    float(run(jnp.float32(0.0)))
    dt = (time.perf_counter() - t0 - 0.035) / n
    print(f"{name}: {dt*1e3:7.3f} ms  ({w_bytes/dt/1e3:.0f} GB/s effective on w)",
          flush=True)


for th in (8, 24, 72):
    pk._DEF_TILE_ROWS = th
    timeit(f"gather  th={th}", lambda s: pk.gather_tpu(buf + s, w, K))
for th in (8, 24, 72):
    pk._DEF_TILE_ROWS = th
    timeit(f"scatter th={th}", lambda s: pk.scatter_tpu(x + s, w, K))
for th in (8, 24, 72):
    pk._DEF_TILE_ROWS = th
    timeit(f"outer   th={th}", lambda s: pk.outer_tpu(g + s, buf, K))
