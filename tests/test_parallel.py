"""Multi-device tests on the virtual 8-device CPU mesh: data-parallel
training equivalence and halo-exchange spatial sharding consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wcmc_tpu.data.batches import synthetic_batch
from wcmc_tpu.parallel.halo import kpcn_spatial_inference
from wcmc_tpu.parallel.mesh import (
    data_parallel_step,
    make_mesh,
    replicate,
    shard_batch,
)
from wcmc_tpu.train.factory import TrainConfig, init_interfaces


def _cfg(**kw):
    return TrainConfig(base_model="kpcn", kpcn_ksize=5, finite_check_every=1,
                       compute_dtype="float32", **kw)


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_spatial=2)
    assert mesh.shape == {"data": 4, "spatial": 2}
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_data_parallel_step_matches_single_device(rng):
    """One DP step over 4 devices == one single-device step on the same
    global batch (same loss, same updated params)."""
    cfg = _cfg()
    iface_a = init_interfaces(cfg)[0]
    iface_b = init_interfaces(cfg)[0]  # identical init (same seed)
    batch = synthetic_batch(rng, "kpcn", batch_size=4, patch=48, spp=2)
    key = jax.random.PRNGKey(7)

    raw_step = iface_a._make_train_step()
    single_states, single_loss = jax.jit(raw_step)(
        jax.tree_util.tree_map(jnp.copy, iface_a.states), batch, key
    )

    mesh = make_mesh(n_data=4)
    with mesh:
        states = replicate(iface_b.states, mesh)
        sharded = shard_batch(batch, mesh)
        step = data_parallel_step(iface_b._make_train_step(), mesh)
        dp_states, dp_loss = step(states, sharded, key)

    # loss dicts must agree (global-mean losses)
    for k in single_loss:
        np.testing.assert_allclose(
            float(single_loss[k]), float(dp_loss[k]), rtol=2e-4, atol=1e-6,
        )
    # updated dncnn params must agree
    a = jax.tree_util.tree_leaves(single_states["dncnn"].params)
    b = jax.tree_util.tree_leaves(dp_states["dncnn"].params)
    for xa, xb in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(xa), np.asarray(xb), rtol=1e-4, atol=1e-5
        )


def test_spatial_halo_inference_matches_single_device(rng):
    """Halo-exchange sharded forward == unsharded forward over the
    globally valid interior (BASELINE.md consistency target)."""
    cfg = _cfg()
    iface = init_interfaces(cfg)[0]
    model = iface.models["dncnn"]
    params = iface.states["dncnn"].params
    shrink = model.shrink  # 40 for ksize=5

    # frame: H=256 rows sharded over 4 devices (band 64), W=96
    batch = synthetic_batch(rng, "kpcn", batch_size=1, patch=96, spp=2)
    # tile the patch vertically to make a 4-band frame
    frame = {
        k: jnp.concatenate([v] * 4, axis=1)
        for k, v in batch.items()
        if k.startswith("kpcn_")
    }

    mesh = make_mesh(n_data=2, n_spatial=4)
    run = kpcn_spatial_inference(model, mesh, halo=24)
    with mesh:
        out_sharded = np.asarray(run(params, frame))

    out_full = np.asarray(
        model.apply({"params": params}, frame)["radiance"]
    )
    H, W = frame["kpcn_albedo"].shape[1:3]
    assert out_sharded.shape == (1, H, W, 3)
    r = shrink // 2
    # compare interiors: unsharded output covers [r, H-r) x [r, W-r)
    inner_sharded = out_sharded[:, r:H - r, r:W - r, :]
    np.testing.assert_allclose(
        inner_sharded, out_full, rtol=1e-4, atol=1e-5
    )


def test_interface_to_mesh_trains(rng):
    """Interface-level DP wiring: to_mesh keeps training functional."""
    cfg = _cfg()
    iface = init_interfaces(cfg)[0]
    mesh = make_mesh(n_data=4)
    iface.to_mesh(mesh)
    batch = synthetic_batch(rng, "kpcn", batch_size=4, patch=48, spp=2)
    iface.preprocess(batch)
    ld = iface.train_batch(batch)
    assert np.isfinite(float(ld["l_total"]))
    iface.to_eval_mode()
    out, _ = iface.validate_batch(batch)
    assert np.isfinite(np.asarray(out)).all()


def test_sample_parallel_pathnet_matches_single_device(rng):
    """spp axis sharded over 4 devices: pmean context == global mean."""
    import jax.random as jrandom

    from wcmc_tpu.models import PathNet
    from wcmc_tpu.parallel.sample import make_sample_parallel

    model = PathNet(ic=36, outc=3)
    batch = {"paths": jnp.asarray(
        rng.standard_normal((2, 8, 16, 16, 36)).astype(np.float32)
    )}
    params = model.init(jrandom.PRNGKey(0), batch)["params"]
    ref = np.asarray(model.apply({"params": params}, batch))

    mesh = make_mesh(n_data=2, n_spatial=4)
    run = make_sample_parallel(model, mesh, ["paths"], axis="spatial")
    with mesh:
        out = np.asarray(run(params, batch))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_sample_parallel_sbmc_matches_single_device(rng):
    import jax.random as jrandom

    from wcmc_tpu.models import Multisteps
    from wcmc_tpu.parallel.sample import make_sample_parallel

    model = Multisteps(n_in=24, ksize=5, n_steps=2, width=16)
    batch = {
        "radiance": jnp.asarray(
            rng.random((1, 4, 16, 16, 3)).astype(np.float32)
        ),
        "features": jnp.asarray(
            rng.standard_normal((1, 4, 16, 16, 24)).astype(np.float32)
        ),
    }
    params = model.init(jrandom.PRNGKey(0), batch)["params"]
    ref = np.asarray(model.apply({"params": params}, batch))

    mesh = make_mesh(n_data=2, n_spatial=4)
    run = make_sample_parallel(
        model, mesh, ["radiance", "features"], axis="spatial"
    )
    with mesh:
        out = np.asarray(run(params, batch))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_to_mesh_val_does_not_jit_per_call(rng, monkeypatch):
    """Steady-state DP validation must reuse one jitted callable; a
    fresh jax.jit wrapper per validate_batch call means a retrace
    every time."""
    import jax

    cfg = _cfg()
    iface = init_interfaces(cfg)[0]
    iface.to_mesh(make_mesh(n_data=4))
    batch = synthetic_batch(rng, "kpcn", batch_size=4, patch=48, spp=2)
    iface.preprocess(batch)
    iface.to_eval_mode()
    iface.validate_batch(batch)  # warm: trace once here

    calls = {"n": 0}
    real_jit = jax.jit

    def counting_jit(*a, **k):
        calls["n"] += 1
        return real_jit(*a, **k)

    monkeypatch.setattr(jax, "jit", counting_jit)
    iface.validate_batch(batch)
    iface.validate_batch(batch)
    assert calls["n"] == 0, "validate_batch created jit wrappers per call"
