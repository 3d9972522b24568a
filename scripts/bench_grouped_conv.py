"""Compare two separate KPCN branch conv stacks vs one grouped conv
stack (feature_group_count=2) on the TPU."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B, H, W, CIN, HID, KOUT = 8, 128, 128, 34, 100, 441
LAYERS = 9
rng = np.random.default_rng(0)


def mkw(cin, cout):
    return jnp.asarray(
        rng.standard_normal((5, 5, cin, cout)).astype(np.float32) * 0.05
    )


x = jnp.asarray(rng.standard_normal((B, H, W, CIN)).astype(np.float32))
x2 = jnp.concatenate([x, x + 0.1], axis=-1)

w_d = [mkw(CIN, HID)] + [mkw(HID, HID)] * 7 + [mkw(HID, KOUT)]
w_s = [mkw(CIN, HID)] + [mkw(HID, HID)] * 7 + [mkw(HID, KOUT)]
w_g = [jnp.concatenate([a, b], axis=-1) for a, b in zip(w_d, w_s)]


def conv(x, w, groups=1):
    x = x.astype(jnp.bfloat16)
    w = w.astype(jnp.bfloat16)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def stack_sep(x, ws):
    h = x
    for w in ws[:-1]:
        h = jax.nn.relu(conv(h, w))
    return conv(h, ws[-1])


def stack_grp(x2, wg):
    h = x2
    for w in wg[:-1]:
        h = jax.nn.relu(conv(h, w, groups=2))
    return conv(h, wg[-1], groups=2)


def loss_sep(ws_d, ws_s, x):
    return (jnp.sum(stack_sep(x, ws_d).astype(jnp.float32) ** 2)
            + jnp.sum(stack_sep(x + 0.1, ws_s).astype(jnp.float32) ** 2))


def loss_grp(wg, x2):
    return jnp.sum(stack_grp(x2, wg).astype(jnp.float32) ** 2)


def timeit(name, f, *args, n=30):
    @jax.jit
    def run(s0, *a):
        def body(i, s):
            out = f(s, *a)
            return sum(jnp.sum(o) * 1e-30
                       for o in jax.tree_util.tree_leaves(out)) + s0
        return jax.lax.fori_loop(0, n, body, s0)
    float(run(jnp.float32(0.0), *args))
    t0 = time.perf_counter()
    float(run(jnp.float32(0.0), *args))
    dt = (time.perf_counter() - t0 - 0.035) / n
    print(f"{name}: {dt*1e3:7.3f} ms", flush=True)
    return dt


# forward only
timeit("fwd separate", lambda s, xx: stack_sep(xx + s, w_d) + stack_sep(xx, w_s), x)
timeit("fwd grouped ", lambda s, xx: stack_grp(xx + s, w_g), x2)
# fwd+bwd
timeit("fwd+bwd separate",
       lambda s, xx: jax.grad(loss_sep, argnums=(0, 1))(
           [w_d[0] + s] + w_d[1:], w_s, xx), x)
timeit("fwd+bwd grouped ",
       lambda s, xx: jax.grad(loss_grp)([w_g[0] + s] + w_g[1:], xx), x2)
