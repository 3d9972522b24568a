"""Microbenchmark Mosaic dot_general dimension-number forms.

The fused MLP backward kernels use transposed contractions:
  wgrad:  dot(h, gz, contracting ((0,),(0,)))   "TN"
  dgrad:  dot(gz, w, contracting ((1,),(1,)))   "NT"
This measures whether those forms pay a Mosaic transpose penalty vs
plain "NN" matmuls, plus the cost of an explicit jnp transpose.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 4096, 128
REPS = 32


def make(case):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        acc = jnp.zeros((o_ref.shape[0], o_ref.shape[1]), jnp.float32)
        for i in range(REPS):
            bb = b + jnp.float32(i).astype(b.dtype)
            if case == "nn":           # (R,C) @ (C,C)
                acc += jax.lax.dot_general(a, bb, (((1,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)
            elif case == "nt":         # (R,C) @ (C,C)^T
                acc += jax.lax.dot_general(a, bb, (((1,), (1,)), ((), ())),
                                           preferred_element_type=jnp.float32)
            elif case == "tn_big":     # (R,C)^T @ (R,C) -> (C,C)
                acc += jax.lax.dot_general(a, a + jnp.float32(i).astype(a.dtype),
                                           (((0,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)
            elif case == "tn_via_transpose":
                at = jnp.transpose(a + jnp.float32(i).astype(a.dtype), (1, 0))
                acc += jax.lax.dot_general(at, a, (((1,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)
        o_ref[...] = acc

    out_shape = (C, C) if case.startswith("tn") else (R, C)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(a, b, n):
        def body(i, s):
            bb = b + (s * 1e-30).astype(b.dtype)
            return s + call(a, bb)[0, 0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    return run


def main():
    a = jnp.ones((R, C), jnp.bfloat16)
    b = jnp.ones((C, C), jnp.bfloat16)
    fl = 2.0 * R * C * C * REPS
    for case in ("nn", "nt", "tn_big", "tn_via_transpose"):
        run = make(case)
        n1 = max(32, int(3e11 / fl)); n2 = 2 * n1
        float(run(a, b, n1)); float(run(a, b, n2))
        def timed(c):
            t0 = time.perf_counter(); float(run(a, b, c))
            return time.perf_counter() - t0
        import statistics
        dts = [(timed(n2) - timed(n1)) / (n2 - n1) for _ in range(3)]
        dt = statistics.median(dts)
        print(f"{case:18s}: {dt*1e6:8.1f} us/call  {fl/dt/1e12:6.1f} TFLOP/s",
              flush=True)


if __name__ == "__main__":
    main()
