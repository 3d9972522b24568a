"""Microbenchmark: Mosaic matmul throughput for conv-kernel candidate shapes.

Each case runs a Pallas kernel whose body does ``reps`` dependent-free
matmuls on VMEM-resident operands (grid=1), so the measurement is pure
MXU issue rate for that (M, K, N) — no HBM traffic in the loop.

Usage: python scripts/bench_mxu_shapes.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_bench(m, k, n, reps, dtype=jnp.bfloat16):
    def kernel(a_ref, b_ref, o_ref):
        acc = jnp.zeros((m, n), jnp.float32)
        a = a_ref[...]
        b = b_ref[...]
        for i in range(reps):
            # vary the small operand so Mosaic can't CSE the loop
            acc += jax.lax.dot_general(
                a, b + jnp.float32(i).astype(b.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[...] = acc

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @functools.partial(jax.jit, static_argnames=("n_it",))
    def run(a, b, n_it):
        def body(i, acc):
            # carry-dependent operand: numerically ~zero, but forces
            # each call to depend on the previous (no hoisting/CSE)
            bb = b + (acc * 1e-30).astype(b.dtype)
            return acc + call(a, bb)[0, 0]
        return jax.lax.fori_loop(0, n_it, body, jnp.float32(0.0))
    return run


def bench(m, k, n, reps=64, dtype=jnp.bfloat16):
    a = jnp.ones((m, k), dtype)
    b = jnp.ones((k, n), dtype)
    run = make_bench(m, k, n, reps, dtype)
    fl_call = 2.0 * m * k * n * reps
    n1 = max(32, int(6e11 / fl_call))
    n2 = 2 * n1
    float(run(a, b, n1))  # compile+warm (n_it is static: warm both)
    float(run(a, b, n2))

    def timed(cnt):
        t0 = time.perf_counter()
        float(run(a, b, cnt))
        return time.perf_counter() - t0

    import statistics
    dts = [(timed(n2) - timed(n1)) / (n2 - n1) for _ in range(3)]
    dt = statistics.median(dts)
    fl = 2.0 * m * k * n * reps
    print(f"M={m:5d} K={k:5d} N={n:4d} reps={reps}: {dt*1e6:9.1f} us  "
          f"{fl/dt/1e12:7.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    cases = [
        (512, 1024, 512, 64),
        # row-major conv candidates: M=pixel rows, K=packed taps, N=Cout
        (512, 2560, 128, 32),
        (512, 2560, 512, 16),    # conv9-ish N=441->512
        (512, 512, 128, 64),     # x-packed K=500
        # cmajor conv candidates: M=Cout, K=packed, N=W'
        (128, 2560, 128, 64),
        (448, 2560, 128, 32),
        # per-tap no-packing
        (1024, 128, 128, 128),
        # pathnet-ish bwd shapes
        (4096, 128, 128, 32),
        (128, 4096, 128, 32),
    ]
    for m, k, n, reps in cases:
        bench(m, k, n, reps)
