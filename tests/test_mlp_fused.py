"""Fused per-pixel MLP: XLA fallback vs direct chain, Pallas kernels in
interpreter mode, gradients (incl. accumulated dW/db), and the PixelMLP
module's equivalence to the unfused ConvChain(ksize=1)."""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

mf = importlib.import_module("wcmc_tpu.ops.mlp_fused")
pk = importlib.import_module("wcmc_tpu.ops.pallas_kernels")


def _chain_params(rng, dims):
    ws = [jnp.asarray(rng.standard_normal((a, b)).astype(np.float32)) * 0.3
          for a, b in zip(dims[:-1], dims[1:])]
    bs = [jnp.asarray(rng.standard_normal((b,)).astype(np.float32)) * 0.1
          for b in dims[1:]]
    return ws, bs


def _direct(x, ws, bs, acts):
    h = x
    for w, b, a in zip(ws, bs, acts):
        z = h @ w + b
        h = {"relu": jax.nn.relu, "linear": lambda t: t,
             "leaky_relu": lambda t: jax.nn.leaky_relu(t, 0.01)}[a](z)
    return h


@pytest.fixture
def rng():
    return np.random.default_rng(0)


DIMS = (36, 64, 64, 64)
ACTS = ("relu", "relu", "linear")


def test_xla_path_matches_direct(rng):
    ws, bs = _chain_params(rng, DIMS)
    x = jnp.asarray(rng.standard_normal((200, DIMS[0])).astype(np.float32))
    got = mf.fused_mlp(x, ws, bs, ACTS)
    want = _direct(x, ws, bs, ACTS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def _force_pallas():
    mf.FORCE_PALLAS = True
    pk.INTERPRET = True


def _unforce():
    mf.FORCE_PALLAS = False
    pk.INTERPRET = False


@pytest.mark.parametrize("n", [96, 1024, 1500])  # exact, one-tile, ragged
def test_pallas_forward_interpret(rng, n):
    ws, bs = _chain_params(rng, DIMS)
    x = jnp.asarray(rng.standard_normal((n, DIMS[0])).astype(np.float32))
    _force_pallas()
    try:
        got = mf.fused_mlp(x, ws, bs, ACTS)
    finally:
        _unforce()
    want = _direct(x, ws, bs, ACTS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("compute_dx", [True, False])
def test_pallas_grads_interpret(rng, compute_dx):
    """dW/db accumulated across row tiles + dx must match autodiff of
    the direct chain (multi-tile: n > tile rows)."""
    old_tile = mf._TILE_ROWS
    mf._TILE_ROWS = 64  # force several tiles incl. a ragged one
    ws, bs = _chain_params(rng, DIMS)
    n = 200
    x = jnp.asarray(rng.standard_normal((n, DIMS[0])).astype(np.float32))

    def loss_fused(x_, ws_, bs_):
        y = mf.fused_mlp(x_, ws_, bs_, ACTS, compute_dx)
        return jnp.sum(jnp.sin(y))

    def loss_direct(x_, ws_, bs_):
        return jnp.sum(jnp.sin(_direct(x_, ws_, bs_, ACTS)))

    _force_pallas()
    try:
        dx, dws, dbs = jax.grad(loss_fused, argnums=(0, 1, 2))(x, ws, bs)
    finally:
        _unforce()
        mf._TILE_ROWS = old_tile
    dx_r, dws_r, dbs_r = jax.grad(loss_direct, argnums=(0, 1, 2))(x, ws, bs)

    if compute_dx:
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r),
                                   rtol=1e-4, atol=1e-4)
    else:
        assert float(jnp.sum(jnp.abs(dx))) == 0.0
    for g, r in zip(dws + dbs, dws_r + dbs_r):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-3)


def test_pixel_mlp_matches_conv_chain(rng):
    """PixelMLP(params mapped) == ConvChain(ksize=1) forward."""
    from wcmc_tpu.models.blocks import ConvChain, PixelMLP

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 36)).astype(np.float32))
    chain = ConvChain(64, width=64, depth=3, ksize=1, pad=False,
                      output_type="linear")
    cp = chain.init(jax.random.PRNGKey(0), x)["params"]
    want = chain.apply({"params": cp}, x)

    mlp = PixelMLP((64, 64, 64), ("relu", "relu", "linear"))
    mp = mlp.init(jax.random.PRNGKey(0), x)["params"]
    # map conv kernels (1,1,cin,cout) -> (cin,cout)
    mapped = {}
    for i, lname in enumerate(["Conv_0", "Conv_1", "Conv_2"]):
        mapped[f"w{i}"] = cp[lname]["kernel"][0, 0]
        mapped[f"b{i}"] = cp[lname]["bias"]
    got = mlp.apply({"params": mapped}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # param shapes agree with the initialized module
    for k in mapped:
        assert mapped[k].shape == mp[k].shape


def test_pathnet_trains_and_shapes(rng):
    """PathNet end-to-end with the fused chains: forward shape and a
    gradient step on all params."""
    from wcmc_tpu.models import PathNet

    model = PathNet(ic=36, outc=3)
    batch = {"paths": jnp.asarray(
        rng.standard_normal((2, 4, 16, 16, 36)).astype(np.float32)
    )}
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    out = model.apply({"params": params}, batch)
    assert out.shape == (2, 4, 16, 16, 3)

    def loss(p):
        return jnp.mean(model.apply({"params": p}, batch) ** 2)

    grads = jax.grad(loss)(params)
    norms = {k: float(jnp.sqrt(sum(
        jnp.sum(g**2) for g in jax.tree_util.tree_leaves(v)
    ))) for k, v in grads.items()}
    for k, v in norms.items():
        assert np.isfinite(v), k
    # both fused chains receive gradient
    assert sum(v for k, v in norms.items() if k.startswith("embedding")) > 0
    assert sum(v for k, v in norms.items() if k.startswith("final")) > 0


# ---------------------------------------------------------------------------
# PathNet-specific fused kernels (embed + mean, head + broadcast ctx)
# ---------------------------------------------------------------------------

pf = importlib.import_module("wcmc_tpu.ops.pathnet_fused")


@pytest.mark.parametrize("hw", [256, 200])  # tile-exact and ragged
def test_pathnet_embed_interpret(rng, hw):
    b, s = 2, 3
    ws, bs = _chain_params(rng, (36, 64, 64, 64))
    x = jnp.asarray(rng.standard_normal((b, s, hw, 36)).astype(np.float32))
    old = pf._EMBED_TILE
    pf._EMBED_TILE = 64
    _force_pallas()
    try:
        e, mean = pf.pathnet_embed(x, ws, bs, ("relu", "relu", "linear"))
    finally:
        _unforce()
        pf._EMBED_TILE = old
    e_r, mean_r = pf._embed_xla(x, ws, bs, ("relu", "relu", "linear"))
    np.testing.assert_allclose(np.asarray(e), np.asarray(e_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_r),
                               rtol=1e-4, atol=1e-4)


def test_pathnet_embed_grads_interpret(rng):
    b, s, hw = 2, 3, 192
    ws, bs = _chain_params(rng, (36, 64, 64, 64))
    x = jnp.asarray(rng.standard_normal((b, s, hw, 36)).astype(np.float32))

    def loss(ws_, bs_, impl):
        e, mean = impl(x, ws_, bs_, ("relu", "relu", "linear"))
        return jnp.sum(jnp.sin(e)) + 2.0 * jnp.sum(jnp.cos(mean))

    old = pf._EMBED_TILE
    pf._EMBED_TILE = 64
    _force_pallas()
    try:
        dws, dbs = jax.grad(lambda w_, b_: loss(w_, b_, pf.pathnet_embed),
                            argnums=(0, 1))(ws, bs)
    finally:
        _unforce()
        pf._EMBED_TILE = old
    dws_r, dbs_r = jax.grad(lambda w_, b_: loss(w_, b_, pf._embed_xla),
                            argnums=(0, 1))(ws, bs)
    for g, r in zip(dws + dbs, dws_r + dbs_r):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("hw", [256, 200])
def test_pathnet_head_interpret(rng, hw):
    b, s, ce = 2, 3, 64
    ws, bs = _chain_params(rng, (128, 128, 3))
    e = jnp.asarray(rng.standard_normal((b, s, hw, ce)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((b, hw, ce)).astype(np.float32))
    old = pf._HEAD_TILE
    pf._HEAD_TILE = 64
    _force_pallas()
    try:
        out = pf.pathnet_head(e, ctx, ws, bs, ("relu", "relu"))
    finally:
        _unforce()
        pf._HEAD_TILE = old
    out_r = pf._head_xla(e, ctx, ws, bs, ("relu", "relu"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                               rtol=1e-4, atol=1e-4)


def test_pathnet_head_grads_interpret(rng):
    b, s, hw, ce = 2, 3, 192, 64
    ws, bs = _chain_params(rng, (128, 128, 3))
    e = jnp.asarray(rng.standard_normal((b, s, hw, ce)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((b, hw, ce)).astype(np.float32))

    def loss(e_, c_, ws_, bs_, impl):
        return jnp.sum(jnp.sin(impl(e_, c_, ws_, bs_, ("relu", "relu"))))

    old = pf._HEAD_TILE
    pf._HEAD_TILE = 64
    _force_pallas()
    try:
        de, dc, dws, dbs = jax.grad(
            lambda *a: loss(*a, pf.pathnet_head), argnums=(0, 1, 2, 3)
        )(e, ctx, ws, bs)
    finally:
        _unforce()
        pf._HEAD_TILE = old
    de_r, dc_r, dws_r, dbs_r = jax.grad(
        lambda *a: loss(*a, pf._head_xla), argnums=(0, 1, 2, 3)
    )(e, ctx, ws, bs)
    np.testing.assert_allclose(np.asarray(de), np.asarray(de_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dc), np.asarray(dc_r),
                               rtol=1e-4, atol=1e-4)
    for g, r in zip(dws + dbs, dws_r + dbs_r):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-3)


def test_dual_pathnet_matches_separate_applies(rng):
    """The block-diagonal dual pass must equal two separate PathNet
    applies (off-diagonal weights are structural zeros)."""
    from wcmc_tpu.models import PathNet
    from wcmc_tpu.models.pathnet import dual_pathnet_apply

    m = PathNet(ic=36, outc=3)
    batch = {"paths": jnp.asarray(
        rng.standard_normal((2, 4, 16, 16, 36)).astype(np.float32)
    )}
    pd = m.init(jax.random.PRNGKey(1), batch)["params"]
    ps = m.init(jax.random.PRNGKey(2), batch)["params"]
    want_d = m.apply({"params": pd}, batch)
    want_s = m.apply({"params": ps}, batch)
    got_d, got_s = dual_pathnet_apply(m, pd, m, ps, batch)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-5, atol=1e-5)

    # gradients flow to BOTH branches' params through the combined pass
    def loss(pd_, ps_):
        a, b = dual_pathnet_apply(m, pd_, m, ps_, batch)
        return jnp.mean(a**2) + jnp.mean(jnp.abs(b))

    gd, gs = jax.grad(loss, argnums=(0, 1))(pd, ps)

    def ref_loss(pd_, ps_):
        return (jnp.mean(m.apply({"params": pd_}, batch) ** 2)
                + jnp.mean(jnp.abs(m.apply({"params": ps_}, batch))))

    gd_r, gs_r = jax.grad(ref_loss, argnums=(0, 1))(pd, ps)
    for g, r in zip(jax.tree_util.tree_leaves((gd, gs)),
                    jax.tree_util.tree_leaves((gd_r, gs_r))):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_pathnet_head_moments_interpret(rng):
    """Fused sum/sumsq accumulators == XLA reductions, incl. gradient
    flow through the sum (mean path into the KPCN input concat)."""
    b, s, hw, ce = 2, 3, 192, 64
    ws, bs = _chain_params(rng, (128, 128, 3))
    e = jnp.asarray(rng.standard_normal((b, s, hw, ce)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((b, hw, ce)).astype(np.float32))

    old = pf._HEAD_TILE
    pf._HEAD_TILE = 64
    _force_pallas()
    try:
        out, ssum, ssq = pf.pathnet_head(e, ctx, ws, bs, ("relu", "relu"),
                                         True)
    finally:
        _unforce()
        pf._HEAD_TILE = old
    out_r, sum_r, sq_r = pf._head_xla(e, ctx, ws, bs, ("relu", "relu"),
                                      moments=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ssum), np.asarray(sum_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ssq), np.asarray(sq_r),
                               rtol=1e-4, atol=1e-4)

    def loss(e_, c_, ws_, bs_, impl):
        o, sm, sq = impl(e_, c_, ws_, bs_, ("relu", "relu"), True)
        # use out + sum + sumsq so every cotangent path is exercised
        return (jnp.sum(jnp.sin(o)) + jnp.sum(jnp.cos(sm))
                + 0.1 * jnp.sum(jnp.sqrt(sq + 1.0)))

    old = pf._HEAD_TILE
    pf._HEAD_TILE = 64
    _force_pallas()
    try:
        grads = jax.grad(lambda *a: loss(*a, pf.pathnet_head),
                         argnums=(0, 1, 2, 3))(e, ctx, ws, bs)
    finally:
        _unforce()
        pf._HEAD_TILE = old
    grads_r = jax.grad(
        lambda *a: loss(*a, lambda e_, c_, w_, b_, ac, m: pf._head_xla(
            e_, c_, w_, b_, ac, moments=m)),
        argnums=(0, 1, 2, 3),
    )(e, ctx, ws, bs)
    for g, r in zip(jax.tree_util.tree_leaves(grads),
                    jax.tree_util.tree_leaves(grads_r)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-3)


def test_interface_moments_match_direct(rng):
    """KPCN input concat built from fused moments == the reference
    formulation (mean over S, biased var / spp, detached)."""
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from wcmc_tpu.data.batches import synthetic_batch
    from wcmc_tpu.train.factory import TrainConfig, init_interfaces
    from wcmc_tpu.train.interfaces import p_buffer_variance, split_disentangle

    cfg = TrainConfig(base_model="kpcn", kpcn_ksize=5, use_llpm_buf=True,
                      manif_learn=True, manif_loss="FMSE",
                      finite_check_every=1)
    iface = init_interfaces(cfg)[0]
    batch = synthetic_batch(np.random.default_rng(3), "kpcn", batch_size=2,
                            patch=32, spp=2, use_llpm_buf=True)
    iface.preprocess(batch)
    params = {n: iface.states[n].params for n in iface.states}
    net_batch, _ = iface._forward_with_paths(params, batch)

    p_d, p_s = iface._dual_pathnet(params, batch)
    _, recon_d = split_disentangle(p_d, iface.disentanglement_option)
    want = jnp.concatenate(
        [batch["kpcn_diffuse_in"], recon_d.mean(axis=1),
         p_buffer_variance(recon_d)], axis=-1,
    )
    np.testing.assert_allclose(
        np.asarray(net_batch["kpcn_diffuse_in"]), np.asarray(want),
        rtol=1e-4, atol=1e-5,
    )


def test_interface_moments_match_direct_disentangled(rng):
    """Same as above but with the m10r01 disentangle split (recon is a
    channel SLICE of the p-buffer) and the validation path, covering
    the moments channel-slicing logic."""
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from wcmc_tpu.data.batches import synthetic_batch
    from wcmc_tpu.train.factory import TrainConfig, init_interfaces
    from wcmc_tpu.train.interfaces import p_buffer_variance, split_disentangle

    cfg = TrainConfig(base_model="kpcn", kpcn_ksize=5, use_llpm_buf=True,
                      manif_learn=True, manif_loss="FMSE",
                      disentangle="m10r01", pnet_out_size=(4,),
                      finite_check_every=1)
    iface = init_interfaces(cfg)[0]
    batch = synthetic_batch(np.random.default_rng(5), "kpcn", batch_size=2,
                            patch=32, spp=2, use_llpm_buf=True)
    iface.preprocess(batch)
    params = {n: iface.states[n].params for n in iface.states}

    # train path
    net_batch, manif = iface._forward_with_paths(params, batch)
    p_d, p_s = iface._dual_pathnet(params, batch)
    manif_d, recon_d = split_disentangle(p_d, "m10r01")
    want = jnp.concatenate(
        [batch["kpcn_diffuse_in"], recon_d.mean(axis=1),
         p_buffer_variance(recon_d)], axis=-1,
    )
    np.testing.assert_allclose(
        np.asarray(net_batch["kpcn_diffuse_in"]), np.asarray(want),
        rtol=1e-4, atol=1e-5,
    )
    # manifold buffers are channel-major (B, S, C, H, W)
    np.testing.assert_allclose(
        np.asarray(manif["diffuse"]),
        np.asarray(jnp.transpose(manif_d, (0, 1, 4, 2, 3))),
        rtol=1e-5, atol=1e-6,
    )

    # val path: p-buffers sliced to the recon half, moments likewise
    val = iface._make_val_step()
    out, p_buffers, _ = val(iface.states, batch)
    c = p_d.shape[-1]
    np.testing.assert_allclose(
        np.asarray(p_buffers["diffuse"]), np.asarray(p_d[..., :c // 2]),
        rtol=1e-5, atol=1e-6,
    )
    assert np.isfinite(np.asarray(out)).all()
