"""Benchmark the Pallas conv2d against XLA's conv at KPCN shapes.

Host timing through the axon tunnel is jitter-dominated, so this
captures a profiler trace of N back-to-back calls and sums the
device-side op durations (scripts/analyze_trace.py machinery).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import collections
import glob
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from wcmc_tpu.ops.conv5 import _conv_fwd_pallas, _conv_xla, _reshape_w

N = 20


def device_ms(trace_dir):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from analyze_trace import op_events

    per = collections.defaultdict(float)
    for name, ms in op_events(trace_dir):
        per[name] += ms
    return per


def bench(tag, fn, args, flops):
    out = fn(*args)                      # compile+warm
    float(jnp.sum(out.astype(jnp.float32)))
    trace = "/tmp/conv5_trace"
    shutil.rmtree(trace, ignore_errors=True)
    jax.profiler.start_trace(trace)
    for _ in range(N):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    jax.profiler.stop_trace()
    per = device_ms(trace)
    # the conv op is the dominant entry; report the largest N-count op
    best = max(per.items(), key=lambda kv: kv[1])
    ms = best[1] / N
    print(f"{tag}: {ms:7.3f} ms  {flops/(ms*1e-3)/1e12:6.1f} TFLOP/s   [{best[0][:70]}]",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    shapes = [
        ("conv1 39->100 @128", 8, 128, 39, 100, 5),
        ("mid  100->100 @120", 8, 120, 100, 100, 5),
        ("conv9 100->441 @96", 8, 96, 100, 441, 5),
        # UNet 3x3 SAME shapes (pre-padded -> VALID), bs8 128px width 64
        ("unet  64->64  @130", 8, 130, 64, 64, 3),
        ("unet 128->128 @66 ", 8, 66, 128, 128, 3),
        ("unet 256->256 @34 ", 8, 34, 256, 256, 3),
        ("unet 384->128 @66 ", 8, 66, 384, 128, 3),
        ("unet 192->64  @130", 8, 130, 192, 64, 3),
    ]
    for tag, b, hw, cin, cout, k in shapes:
        x = jnp.asarray(rng.standard_normal((b, hw, hw, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.05,
                        jnp.float32)
        bias = jnp.zeros((cout,), jnp.float32)
        flops = 2.0 * b * (hw - k + 1) ** 2 * k * k * cin * cout

        bench(tag + " pallas",
              lambda x_, w_, b_, k_=k: _conv_fwd_pallas(
                  x_, _reshape_w(w_, x_.dtype), b_, k_, "relu", x_.dtype),
              (x, w, bias), flops)
        bench(tag + " xla   ",
              jax.jit(lambda x_, w_, b_, k_=k: _conv_xla(x_, w_, b_, k_, "relu")),
              (x, w, bias), flops)


if __name__ == "__main__":
    main()
