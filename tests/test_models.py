"""Model geometry + forward-shape tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wcmc_tpu.models import KPCN, LayerNet, Multisteps, PathNet
from wcmc_tpu.models.blocks import ConvChain, UNet


def test_convchain_valid_shrink():
    m = ConvChain(out_channels=8, width=16, depth=3, ksize=5, pad=False)
    x = jnp.zeros((1, 40, 40, 4))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (1, 40 - 12, 40 - 12, 8)


def test_unet_same_size():
    m = UNet(out_channels=8, num_levels=3, width=8, num_convs=1)
    x = jnp.zeros((1, 32, 32, 4))
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (1, 32, 32, 8)


@pytest.mark.parametrize("width", [8, 64])
def test_dual_unet_matches_separate_applies(width):
    """Block-diagonal dual UNet == two separate applies (narrow levels
    merged; width 64 exercises the flagship merge/per-branch mix,
    width 8 merges every level)."""
    from wcmc_tpu.models.blocks import dual_unet_apply

    m = UNet(out_channels=width, num_levels=3, width=width, num_convs=2)
    k = jax.random.PRNGKey(0)
    xa = jax.random.normal(jax.random.fold_in(k, 1), (2, 16, 16, width))
    xb = jax.random.normal(jax.random.fold_in(k, 2), (2, 16, 16, width))
    pa = m.init(jax.random.fold_in(k, 3), xa)["params"]
    pb = m.init(jax.random.fold_in(k, 4), xb)["params"]

    want_a = m.apply({"params": pa}, xa)
    want_b = m.apply({"params": pb}, xb)
    got_a, got_b = dual_unet_apply(m, pa, pb, xa, xb)
    np.testing.assert_allclose(got_a, want_a, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got_b, want_b, rtol=2e-5, atol=2e-5)

    # gradients must slice back to the per-branch params exactly
    def loss_dual(pa_, pb_):
        ya, yb = dual_unet_apply(m, pa_, pb_, xa, xb)
        return jnp.sum(ya**2) + jnp.sum(yb * 0.5)

    def loss_sep(pa_, pb_):
        ya = m.apply({"params": pa_}, xa)
        yb = m.apply({"params": pb_}, xb)
        return jnp.sum(ya**2) + jnp.sum(yb * 0.5)

    gd = jax.grad(loss_dual, argnums=(0, 1))(pa, pb)
    gs = jax.grad(loss_sep, argnums=(0, 1))(pa, pb)
    # f32 summation-order noise through the deep chain reaches ~1e-4
    # relative; compare against each tensor's own magnitude
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            a, b, rtol=1e-3, atol=1e-3 * (abs(np.asarray(b)).max() + 1e-9)
        ),
        gd, gs,
    )


def test_pathnet_shapes():
    m = PathNet(ic=36, outc=3)
    x = {"paths": jnp.zeros((2, 4, 32, 32, 36))}
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 4, 32, 32, 3)
    # relu output head: non-negative
    assert float(np.asarray(y).min()) >= 0.0


def test_kpcn_geometry_128_to_72():
    """The reference's geometry contract: 128 px patch -> 72 px output
    (reference test_models.py:218-219)."""
    m = KPCN(n_in=34)
    assert m.shrink == 56
    # run at reduced size to keep the CPU test fast: 9 convs(5x5) + 21
    # kernel -> shrink 56; use 64 px input -> 8 px output
    b = {
        "kpcn_diffuse_in": jnp.zeros((1, 64, 64, 34)),
        "kpcn_specular_in": jnp.zeros((1, 64, 64, 34)),
        "kpcn_diffuse_buffer": jnp.zeros((1, 64, 64, 3)),
        "kpcn_specular_buffer": jnp.zeros((1, 64, 64, 3)),
        "kpcn_albedo": jnp.zeros((1, 64, 64, 3)),
    }
    params = m.init(jax.random.PRNGKey(0), b)
    out = m.apply(params, b)
    assert out["radiance"].shape == (1, 8, 8, 3)
    assert out["diffuse"].shape == (1, 8, 8, 3)
    assert out["specular"].shape == (1, 8, 8, 3)


def test_kpcn_small_kernel_full():
    """Full KPCN forward with a small kernel for speed; recombination
    radiance = albedo * diffuse + expm1(specular)."""
    m = KPCN(n_in=34, ksize=5, depth=2, width=8)
    h = 2 * 4 + 4 + 8  # conv shrink + kernel shrink + out 8
    key = jax.random.PRNGKey(1)
    b = {
        "kpcn_diffuse_in": jax.random.normal(key, (1, h, h, 34)) * 0.1,
        "kpcn_specular_in": jax.random.normal(key, (1, h, h, 34)) * 0.1,
        "kpcn_diffuse_buffer": jnp.ones((1, h, h, 3)) * 0.5,
        "kpcn_specular_buffer": jnp.ones((1, h, h, 3)) * 0.2,
        "kpcn_albedo": jnp.ones((1, h, h, 3)) * 0.8,
    }
    params = m.init(key, b)
    out = m.apply(params, b)
    # constant buffers + softmax kernels => exact constants out
    np.testing.assert_allclose(np.asarray(out["diffuse"]), 0.5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["specular"]), 0.2, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["radiance"]), 0.8 * 0.5 + np.expm1(0.2), rtol=1e-5
    )


def test_multisteps_shapes():
    m = Multisteps(n_in=24, ksize=5, n_steps=2, width=16)
    b = {
        "radiance": jnp.ones((1, 3, 16, 16, 3)),
        "features": jnp.zeros((1, 3, 16, 16, 24)),
    }
    params = m.init(jax.random.PRNGKey(0), b)
    out = m.apply(params, b)
    assert out.shape == (1, 16, 16, 3)
    # constant radiance in -> constant out (weight-normalized splat)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-4)


def test_multisteps_exp_weighting_shift_invariant():
    """The exp splat weighting (upstream KernelWeighting semantics) is
    invariant to a global logit shift: only weight RATIOS reach the
    normalized output, so adding a constant to the kernel-head bias is
    a no-op.  This pins the per-image max-subtraction as exact (not an
    approximation)."""
    m = Multisteps(n_in=24, ksize=5, n_steps=1, width=16,
                   splat_weighting="exp")
    b = {
        "radiance": jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 16, 16, 3)),
        "features": jax.random.normal(jax.random.PRNGKey(3), (1, 3, 16, 16, 24)),
    }
    params = m.init(jax.random.PRNGKey(0), b)
    out = m.apply(params, b)
    shifted = jax.tree_util.tree_map_with_path(
        lambda path, v: v + 7.0 if "kernel_head" in str(path) and v.ndim == 1
        else v,
        params,
    )
    out2 = m.apply(shifted, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_multisteps_softmax_ablation_mode():
    """splat_weighting='softmax' (the r3 behavior) stays available as
    an ablation knob and still preserves constants."""
    m = Multisteps(n_in=24, ksize=5, n_steps=1, width=16,
                   splat_weighting="softmax")
    b = {
        "radiance": jnp.ones((1, 3, 16, 16, 3)),
        "features": jnp.zeros((1, 3, 16, 16, 24)),
    }
    params = m.init(jax.random.PRNGKey(0), b)
    np.testing.assert_allclose(np.asarray(m.apply(params, b)), 1.0, rtol=1e-4)


def test_multisteps_trains_without_activation_runaway():
    """Regression for the r4/r5 SBMC collapse: the splat loss rewards
    kernel sharpness and that gradient distributes a tiny gain
    increase over every layer of the ~50-conv trunk, which compounded
    exponentially (raw logits 0.09 -> 4e7 within 3 steps at lr 1e-3,
    f32 inf by step 19, output frozen at zero). With the stage-RMS
    trunk + standardized splat logits, an aggressive short overfit
    must keep the loss finite and the raw head output bounded."""
    import jax.numpy as jnp

    from wcmc_tpu.data.batches import synthetic_batch
    from wcmc_tpu.train.factory import TrainConfig, init_interfaces

    cfg = TrainConfig(base_model="sbmc", sbmc_ksize=5, use_llpm_buf=False,
                      manif_learn=False, manif_loss=None, lr_dncnn=1e-2,
                      finite_check_every=10**9, warmup_steps=0)
    iface = init_interfaces(cfg)[0]
    rng = np.random.default_rng(0)
    b = synthetic_batch(rng, "sbmc", batch_size=1, patch=16, spp=2,
                        use_llpm_buf=False)
    iface.to_train_mode()
    for _ in range(12):
        iface.preprocess(b)
        ld = iface.train_batch(b)
    assert np.isfinite(float(ld["l_total"]))
    m = iface.models["dncnn"]
    _, inter = m.apply(
        {"params": iface.states["dncnn"].params}, b,
        capture_intermediates=lambda mdl, _: mdl.name == "kernel_head")
    lg = jnp.asarray(
        inter["intermediates"]["kernel_head"]["__call__"][0]
    ).astype(jnp.float32)
    assert float(jnp.abs(lg).max()) < 1e4


def test_layernet_shapes():
    m = LayerNet(n_in=24, ksize=5, width=16, embed_width=8)
    b = {
        "radiance": jnp.ones((1, 3, 16, 16, 3)) * 2.0,
        "features": jnp.zeros((1, 3, 16, 16, 24)),
    }
    params = m.init(jax.random.PRNGKey(0), b)
    out = m.apply(params, b)
    assert out.shape == (1, 16, 16, 3)
    # layer occupancies sum to 1 and constant field is preserved
    np.testing.assert_allclose(np.asarray(out), 2.0, rtol=1e-4)


def test_pathnet_grad_flows():
    m = PathNet(ic=36, outc=3)
    x = {"paths": jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 16, 36))}
    params = m.init(jax.random.PRNGKey(1), x)

    def loss(p):
        return jnp.sum(m.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    norms = [float(jnp.abs(v).sum()) for v in jax.tree_util.tree_leaves(g)]
    assert sum(norms) > 0
