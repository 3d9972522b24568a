"""Golden numeric parity against the actual PyTorch/NumPy reference.

These tests import and execute the UNMODIFIED upstream code from
/root/reference (torch-cpu is in the image) on synthetic OptaGen-layout
dumps and assert this repo matches it:

  * preprocessing buffers (LLPM / SBMC / KPCN)   <= 1e-5
  * FMSE / GRS manifold losses, matched draws    <= 1e-5 relative
  * eval metrics (MSE / RelMSE / L1 / RelL1 / T*)<= 1e-6
  * native SSIM vs an independent brute-force sliding-window SSIM

Randomness matching: the reference draws torch.randperm inside the loss
forward; here torch.randperm is monkeypatched to replay the exact
permutations jax.random draws for ``pairing='permutation'`` so both
sides see identical pairings.

Missing upstream deps are stubbed at import time:
  * kornia.rgb_to_hls -> this repo's ops/colors.py via numpy (so the
    FMSE-hls check verifies everything downstream of the color
    conversion; rgb_to_hls itself is covered by a roundtrip test in
    test_losses.py),
  * skimage.metrics.structural_similarity -> brute-force reimplementation
    local to this file (independent of wcmc_tpu.metrics).
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "support")),
    reason="upstream reference checkout not available",
)

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# Import the reference with its missing deps stubbed
# ---------------------------------------------------------------------------

def _brute_force_ssim_channel(im, ref, data_range=2.0, win=7,
                              k1=0.01, k2=0.03):
    """Direct sliding-window SSIM (sample covariance), written from the
    Wang et al. formula — independent of wcmc_tpu.metrics internals."""
    im = im.astype(np.float64)
    ref = ref.astype(np.float64)
    h, w = im.shape
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    pad = (win - 1) // 2
    vals = []
    for y in range(pad, h - pad):
        for x in range(pad, w - pad):
            a = im[y - pad:y + pad + 1, x - pad:x + pad + 1].ravel()
            b = ref[y - pad:y + pad + 1, x - pad:x + pad + 1].ravel()
            ua, ub = a.mean(), b.mean()
            va = a.var(ddof=1)
            vb = b.var(ddof=1)
            cov = ((a - ua) * (b - ub)).sum() / (a.size - 1)
            vals.append(
                ((2 * ua * ub + c1) * (2 * cov + c2))
                / ((ua**2 + ub**2 + c1) * (va + vb + c2))
            )
    return float(np.mean(vals))


def _stub_ssim(im, ref, multichannel=True, full=False, **kw):
    assert multichannel and im.ndim == 3
    mean = float(np.mean([
        _brute_force_ssim_channel(im[..., c], ref[..., c])
        for c in range(im.shape[-1])
    ]))
    if full:
        # the reference only uses the mean; return a flat map
        return mean, np.full(im.shape, mean)
    return mean


@pytest.fixture(scope="module")
def ref_modules():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    if "kornia" not in sys.modules:
        import jax

        from wcmc_tpu.ops.colors import rgb_to_hls as _jax_rgb_to_hls

        kornia = types.ModuleType("kornia")

        def rgb_to_hls(t):
            # torch (*, 3, H, W) -> channels-last -> jax -> back
            x = np.moveaxis(t.detach().numpy(), -3, -1)
            y = np.asarray(_jax_rgb_to_hls(jax.numpy.asarray(x)))
            return torch.from_numpy(np.moveaxis(y, -1, -3).copy())

        kornia.rgb_to_hls = rgb_to_hls
        sys.modules["kornia"] = kornia

    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        sk_metrics = types.ModuleType("skimage.metrics")
        sk_metrics.structural_similarity = _stub_ssim
        skimage.metrics = sk_metrics
        sys.modules["skimage"] = skimage
        sys.modules["skimage.metrics"] = sk_metrics

    import support.datasets as ref_datasets
    import support.losses as ref_losses
    import support.metrics as ref_metrics

    return ref_datasets, ref_losses, ref_metrics


@pytest.fixture(scope="module")
def raw_sample():
    from wcmc_tpu.data.synthetic import (
        synthetic_ground_truth, synthetic_raw_sample,
    )

    rng = np.random.default_rng(42)
    gt = synthetic_ground_truth(rng, 64, 64)
    raw, _ = synthetic_raw_sample(rng, 64, 64, 4, gt=gt)
    return raw, gt


@pytest.fixture(scope="module")
def ref_dataset(ref_modules, tmp_path_factory):
    """An upstream DenoiseDataset instance (its __init__ only walks the
    gt dir; preprocessing methods are pure given the idx maps)."""
    ref_datasets, _, _ = ref_modules
    root = tmp_path_factory.mktemp("ref_ds")
    (root / "train" / "gt").mkdir(parents=True)
    np.save(root / "train" / "gt" / "dummy.npy", np.zeros((4, 4, 9), np.float32))
    return ref_datasets.DenoiseDataset(
        str(root), spp=4, base_model="kpcn", mode="train", batch_size=8,
        sampling="random", use_g_buf=True, use_sbmc_buf=False,
        use_llpm_buf=True,
    )


# ---------------------------------------------------------------------------
# Preprocessing buffers (reference support/datasets.py:301-582)
# ---------------------------------------------------------------------------

def test_llpm_buffer_parity(ref_dataset, raw_sample):
    from wcmc_tpu.data.preprocess import preprocess_llpm

    raw, _ = raw_sample
    want = ref_dataset._preprocess_llpm(raw)
    got = np.asarray(preprocess_llpm(raw))
    assert got.shape == want.shape == raw.shape[:3] + (37,)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sbmc_buffers_parity(ref_dataset, raw_sample):
    from wcmc_tpu.data.preprocess import preprocess_sbmc

    raw, _ = raw_sample
    want_s, want_p = ref_dataset._preprocess_sbmc(raw)
    got_s, got_p = preprocess_sbmc(raw)
    np.testing.assert_allclose(np.asarray(got_s), want_s, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_p), want_p, rtol=1e-5, atol=1e-6)


def test_kpcn_buffer_parity(ref_dataset, raw_sample):
    from wcmc_tpu.data.preprocess import preprocess_kpcn

    raw, _ = raw_sample
    want = ref_dataset._preprocess_kpcn(raw)
    got = np.asarray(preprocess_kpcn(raw))
    assert got.shape == want.shape == raw.shape[:2] + (44,)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Manifold losses with matched random draws
# ---------------------------------------------------------------------------

def _loss_inputs(b=2, s=4, h=8, w=8, c=3, seed=0):
    rng = np.random.default_rng(seed)
    p = rng.standard_normal((b, s, h, w, c)).astype(np.float32)
    ref = np.abs(rng.standard_normal((b, h, w, 3))).astype(np.float32)
    return p, ref


def _matched_perms(key, n_patch, n_batch):
    """Replay jax's permutation draws (feature_mse/GRS split the key
    into (k_patch, k_batch) and permute inside _shuffle)."""
    import jax

    k_patch, k_batch = jax.random.split(key)
    perm_p = np.asarray(jax.random.permutation(k_patch, n_patch))
    perm_b = np.asarray(jax.random.permutation(k_batch, n_batch))
    return perm_p, perm_b


class _ReplayRandperm:
    def __init__(self, perms):
        self.perms = [torch.from_numpy(np.asarray(p).copy()) for p in perms]

    def __call__(self, n, **kw):
        p = self.perms.pop(0)
        assert len(p) == n, f"randperm({n}) but scripted perm has {len(p)}"
        return p


@pytest.mark.parametrize("color", ["rgb", "hls"])
def test_feature_mse_parity(ref_modules, monkeypatch, color):
    import jax

    from wcmc_tpu.losses import feature_mse

    _, ref_losses, _ = ref_modules
    p, ref = _loss_inputs()
    b, s, h, w, c = p.shape
    key = jax.random.PRNGKey(7)
    got = float(feature_mse(key, p, ref, color=color, non_local=True,
                            pairing="permutation"))

    perms = _matched_perms(key, s * h * w, b * s * h * w)
    monkeypatch.setattr(torch, "randperm", _ReplayRandperm(perms))
    loss = ref_losses.FeatureMSE(color=color, non_local=True)
    want = float(loss(
        torch.from_numpy(np.moveaxis(p, -1, 2).copy()),   # (B,S,C,H,W)
        torch.from_numpy(np.moveaxis(ref, -1, 1).copy()),  # (B,C,H,W)
    ))
    assert got == pytest.approx(want, rel=1e-5, abs=1e-7)


def test_grs_parity(ref_modules, monkeypatch):
    import jax

    from wcmc_tpu.losses import global_relative_similarity

    _, ref_losses, _ = ref_modules
    p, ref = _loss_inputs(seed=3)
    b, s, h, w, c = p.shape
    key = jax.random.PRNGKey(11)
    got = float(global_relative_similarity(key, p, ref, alpha=2.0,
                                           pairing="permutation"))

    perms = _matched_perms(key, s * h * w, b * s * h * w)
    monkeypatch.setattr(torch, "randperm", _ReplayRandperm(perms))
    loss = ref_losses.GlobalRelativeSimilarityLoss(alpha=2, color="rgb")
    want = float(loss(
        torch.from_numpy(np.moveaxis(p, -1, 2).copy()),
        torch.from_numpy(np.moveaxis(ref, -1, 1).copy()),
    ))
    assert got == pytest.approx(want, rel=1e-5, abs=1e-7)


def test_tonemap_gamma_parity(ref_modules):
    from wcmc_tpu.utils.utils import tonemap_gamma

    _, ref_losses, _ = ref_modules
    x = np.linspace(-1, 50, 300, dtype=np.float32).reshape(1, 3, 100)
    want = ref_losses.FeatureMSE()._tonemap_gamma(
        torch.from_numpy(x)
    ).numpy()
    got = np.asarray(tonemap_gamma(x))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# Reconstruction losses (reference support/losses.py:245-331)
# ---------------------------------------------------------------------------

def test_reconstruction_losses_parity(ref_modules):
    _, ref_losses, _ = ref_modules
    from wcmc_tpu import losses as L

    rng = np.random.default_rng(5)
    im = np.abs(rng.standard_normal((2, 16, 16, 3))).astype(np.float32)
    ref = np.abs(rng.standard_normal((2, 16, 16, 3))).astype(np.float32)
    t_im = torch.from_numpy(np.moveaxis(im, -1, 1).copy())
    t_ref = torch.from_numpy(np.moveaxis(ref, -1, 1).copy())

    pairs = [
        (L.relative_mse(im, ref), ref_losses.RelativeMSE()(t_im, t_ref)),
        (L.smape(im, ref), ref_losses.SMAPE()(t_im, t_ref)),
        (L.tonemapped_mse(im, ref), ref_losses.TonemappedMSE()(t_im, t_ref)),
        (
            L.tonemapped_relative_mse(im, ref),
            ref_losses.TonemappedRelativeMSE()(t_im, t_ref),
        ),
    ]
    for got, want in pairs:
        assert float(got) == pytest.approx(float(want), rel=1e-5, abs=1e-7)


# ---------------------------------------------------------------------------
# Eval metrics (reference support/metrics.py)
# ---------------------------------------------------------------------------

def test_metrics_parity(ref_modules):
    _, _, ref_metrics = ref_modules
    from wcmc_tpu import metrics as M

    rng = np.random.default_rng(9)
    im = np.abs(rng.standard_normal((32, 32, 3))).astype(np.float32)
    ref = np.abs(rng.standard_normal((32, 32, 3))).astype(np.float32)
    im_nan = im.copy()
    im_nan[3, 4, 1] = np.nan  # RelMSE must drop NaN entries

    for name in ("MSE", "RelMSE", "TRelMSE", "L1", "RelL1"):
        got = getattr(M, name)(im, ref)
        want = getattr(ref_metrics, name)(im, ref)
        assert float(got) == pytest.approx(float(want), rel=1e-6), name
    assert float(M.RelMSE(im_nan, ref)) == pytest.approx(
        float(ref_metrics.RelMSE(im_nan, ref)), rel=1e-6
    )
    assert np.isfinite(M.RelMSE(im_nan, ref))


def test_native_ssim_vs_brute_force():
    """wcmc_tpu.metrics.SSIM (uniform_filter implementation) vs the
    direct per-window computation above."""
    from wcmc_tpu import metrics as M

    rng = np.random.default_rng(17)
    im = rng.random((24, 24, 3)).astype(np.float32)
    ref = np.clip(im + 0.1 * rng.standard_normal(im.shape), 0, 1).astype(
        np.float32
    )
    got = float(M.SSIM(im, ref))
    want = 1.0 - _stub_ssim(im, ref, multichannel=True)
    assert got == pytest.approx(want, rel=1e-9, abs=1e-9)


def test_kpcn_targets_parity(raw_sample):
    """GT target transform (albedo-factored diffuse, log specular)
    vs the reference formulation at datasets.py:1119-1126. The repo
    clamps log1p's argument at -0.9999 — identical whenever
    total >= diffuse - 1 (always true for physical GT)."""
    from wcmc_tpu.data.preprocess import kpcn_targets

    _, gt = raw_sample
    total, diffuse, albedo = gt[..., 0:3], gt[..., 3:6], gt[..., 6:]
    want_diffuse = diffuse / (albedo + 0.00316)
    want_specular = np.log(1 + total - diffuse)
    got = kpcn_targets(gt)
    np.testing.assert_allclose(np.asarray(got["target_diffuse"]),
                               want_diffuse, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got["target_specular"]),
                               want_specular, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got["target_total"]), total,
                               rtol=1e-6, atol=0)
