"""Integration: one train + validate step per interface on synthetic data
(the reference's BASELINE configs, scaled down for CPU)."""

import jax
import numpy as np
import pytest

from wcmc_tpu.data.batches import synthetic_batch
from wcmc_tpu.train.factory import TrainConfig, init_interfaces


def _small_kpcn_cfg(**kw):
    return TrainConfig(
        base_model="kpcn", kpcn_ksize=5, finite_check_every=1, **kw
    )


def _assert_trains(iface, batch, expected_losses):
    iface.to_train_mode()
    iface.preprocess(batch)
    loss_dict = iface.train_batch(batch)
    for k in expected_losses:
        assert k in loss_dict, f"missing loss {k}: {list(loss_dict)}"
        assert np.isfinite(float(loss_dict[k]))
    # a second step must also work (donated states round-trip)
    iface.preprocess(batch)
    loss_dict2 = iface.train_batch(batch)
    assert np.isfinite(float(loss_dict2[expected_losses[0]]))

    iface.to_eval_mode()
    out, p_buffers = iface.validate_batch(batch)
    assert np.isfinite(np.asarray(out)).all()
    summary = iface.get_epoch_summary("eval", norm=1)
    assert np.isfinite(summary)
    return out, p_buffers


def test_kpcn_vanilla_step(rng):
    cfg = _small_kpcn_cfg()
    iface = init_interfaces(cfg)[0]
    # patch must exceed the model shrink (2*4+4=12 with test kernel);
    # KPCN(n_in=34, ksize=5): shrink = 9*4 + 4 = 40 -> use 48 px patches
    batch = synthetic_batch(rng, "kpcn", batch_size=2, patch=48, spp=2)
    out, p = _assert_trains(iface, batch, ["l_diffuse", "l_specular", "l_total", "rmse"])
    assert out.shape == (2, 8, 8, 3)
    assert p is None


def test_kpcn_manifold_step(rng):
    cfg = _small_kpcn_cfg(
        use_llpm_buf=True, manif_learn=True, manif_loss="FMSE"
    )
    iface = init_interfaces(cfg)[0]
    batch = synthetic_batch(
        rng, "kpcn", batch_size=2, patch=48, spp=2, use_llpm_buf=True
    )
    out, p = _assert_trains(
        iface, batch,
        ["l_diffuse", "l_specular", "l_manif_diffuse", "l_manif_specular",
         "l_total", "rmse"],
    )
    assert p["diffuse"].shape == (2, 2, 48, 48, 3)


def test_kpcn_manifold_disentangle_grs(rng):
    cfg = _small_kpcn_cfg(
        use_llpm_buf=True, manif_learn=True, manif_loss="GRS",
        pnet_out_size=(4,), disentangle="m10r01",
    )
    iface = init_interfaces(cfg)[0]
    batch = synthetic_batch(
        rng, "kpcn", batch_size=1, patch=48, spp=2, use_llpm_buf=True
    )
    _assert_trains(iface, batch, ["l_manif_diffuse", "l_total", "rmse"])


def test_kpcn_joint_mode(rng):
    cfg = _small_kpcn_cfg(train_branches=False)
    iface = init_interfaces(cfg)[0]
    batch = synthetic_batch(rng, "kpcn", batch_size=1, patch=48, spp=2)
    loss_dict_keys = ["l_total", "rmse"]
    _assert_trains(iface, batch, loss_dict_keys)


def test_kpcn_ref_interface(rng):
    cfg = _small_kpcn_cfg(kpcn_ref=True)
    iface = init_interfaces(cfg)[0]
    batch = synthetic_batch(rng, "kpcn", batch_size=1, patch=48, spp=2)
    _assert_trains(iface, batch, ["l_diffuse", "l_specular"])


def test_kpcn_pre_interface_both_phases(rng):
    batch = synthetic_batch(
        np.random.default_rng(7), "kpcn", batch_size=1, patch=48, spp=2,
        use_llpm_buf=True,
    )
    # phase (a): manifold pre-training
    cfg = _small_kpcn_cfg(
        kpcn_pre=True, use_llpm_buf=True, manif_learn=True, manif_loss="FMSE"
    )
    iface = init_interfaces(cfg)[0]
    iface.preprocess(batch)
    ld = iface.train_batch(batch)
    assert "l_manif_diffuse" in ld
    # dncnn params must be untouched in phase (a)
    # phase (b): KPCN under frozen PathNet
    cfg = _small_kpcn_cfg(kpcn_pre=True, use_llpm_buf=True)
    iface_b = init_interfaces(cfg)[0]
    before = np.asarray(
        next(iter(
            jax_leaves(iface_b.states["backbone_diffuse"].params)
        ))
    ).copy()
    iface_b.preprocess(batch)
    ld = iface_b.train_batch(batch)
    assert "l_diffuse" in ld
    after = np.asarray(
        next(iter(
            jax_leaves(iface_b.states["backbone_diffuse"].params)
        ))
    )
    np.testing.assert_array_equal(before, after)  # backbone frozen


def jax_leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)


def test_sbmc_vanilla_step(rng):
    cfg = TrainConfig(base_model="sbmc", sbmc_ksize=5, finite_check_every=1)
    iface = init_interfaces(cfg)[0]
    batch = synthetic_batch(rng, "sbmc", batch_size=1, patch=16, spp=2)
    out, p = _assert_trains(iface, batch, ["l_total", "rmse"])
    assert out.shape == (1, 16, 16, 3)


def test_sbmc_manifold_step(rng):
    cfg = TrainConfig(
        base_model="sbmc", sbmc_ksize=5, use_sbmc_buf=False,
        use_llpm_buf=True, manif_learn=True, manif_loss="FMSE",
        finite_check_every=1,
    )
    iface = init_interfaces(cfg)[0]
    batch = synthetic_batch(
        rng, "sbmc", batch_size=1, patch=16, spp=2,
        use_llpm_buf=True, use_sbmc_buf=False,
    )
    out, p = _assert_trains(iface, batch, ["l_manif", "l_recon", "l_total", "rmse"])
    assert p.shape == (1, 2, 16, 16, 3)


def test_lbmc_step(rng):
    cfg = TrainConfig(base_model="lbmc", finite_check_every=1)
    iface = init_interfaces(cfg)[0]
    batch = synthetic_batch(rng, "lbmc", batch_size=1, patch=16, spp=2)
    out, _ = _assert_trains(iface, batch, ["l_total", "rmse"])
    assert out.shape == (1, 16, 16, 3)


def test_grid_sweep_builds_multiple_interfaces():
    cfg = _small_kpcn_cfg(
        use_llpm_buf=True, manif_learn=True, manif_loss="FMSE",
        lr_pnet=(1e-4, 1e-3), w_manif=(0.1, 0.2),
    )
    ifaces = init_interfaces(cfg)
    assert len(ifaces) == 4


def test_config_validation_rules():
    with pytest.raises(ValueError):
        TrainConfig(base_model="kpcn", manif_learn=True).validate()
    with pytest.raises(ValueError):
        TrainConfig(
            base_model="kpcn", manif_loss="FMSE", manif_learn=False
        ).validate()
    with pytest.raises(ValueError):
        TrainConfig(
            base_model="kpcn", use_llpm_buf=True, manif_learn=True,
            manif_loss="FMSE", disentangle="m10r01", pnet_out_size=(3,),
        ).validate()


@pytest.mark.parametrize("base", ["sbmc", "lbmc"])
def test_backbone_receives_recon_gradient(base):
    """With use_llpm_buf and NO manifold loss, the PathNet backbone must
    still receive gradient through the denoiser's features input (the
    fused embedding kernels must propagate d(input) — regression for a
    round-2 compute_dx=False bug that silently froze the backbone)."""
    import jax.numpy as jnp

    cfg = TrainConfig(base_model=base, sbmc_ksize=5, use_llpm_buf=True,
                      manif_learn=False, finite_check_every=1)
    iface = init_interfaces(cfg)[0]
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, base, batch_size=2, patch=16, spp=2,
                            use_llpm_buf=True)
    iface.preprocess(batch)
    before = jax.tree_util.tree_leaves(iface.states["backbone"].params)
    before = [np.asarray(x).copy() for x in before]
    for _ in range(2):
        iface.train_batch(batch)
    after = jax.tree_util.tree_leaves(iface.states["backbone"].params)
    delta = sum(
        float(jnp.sum(jnp.abs(jnp.asarray(a) - jnp.asarray(b))))
        for a, b in zip(after, before)
    )
    assert delta > 0, (
        f"{base} backbone params did not move under the recon loss"
    )
