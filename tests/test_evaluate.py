"""Full-frame inference + evaluation harness (reference test_models.py
contracts), incl. the tiled == untiled consistency requirement."""

import os

import numpy as np
import pytest

from wcmc_tpu import evaluate
from wcmc_tpu.data.dataset import offline_preprocess
from wcmc_tpu.data.full_image import FullImageDataset
from wcmc_tpu.data.synthetic import synthetic_ground_truth, synthetic_raw_sample
from wcmc_tpu.train.factory import TrainConfig, init_interfaces


@pytest.fixture(scope="module")
def eval_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("eval_synth")
    rng = np.random.default_rng(7)
    size, spp = 192, 4
    for mode in ("test",):
        (root / mode / "gt").mkdir(parents=True)
        (root / mode / "input").mkdir(parents=True)
        gt = synthetic_ground_truth(rng, size, size)
        raw, _ = synthetic_raw_sample(rng, size, size, spp, gt=gt)
        np.save(root / mode / "gt" / "scene0.npy", gt)
        np.save(root / mode / "input" / "scene0.npy", raw)
    offline_preprocess(str(root), mode="test", spp=spp, test_spps=(2, 4))
    return str(root)


@pytest.fixture(scope="module")
def kpcn_iface():
    # f32 compute: the tiled == untiled check is a tight numeric identity
    cfg = TrainConfig(base_model="kpcn", kpcn_ksize=5, finite_check_every=1,
                      compute_dtype="float32")
    return init_interfaces(cfg)[0]


def test_tiled_inference_matches_untiled(eval_root, kpcn_iface):
    """Tile assembly must reproduce the untiled forward wherever the
    untiled output is defined (BASELINE.md consistency target).
    KPCN (ksize 5): shrink 40 -> untiled valid region is [20, H-20)."""
    fn = os.path.join(eval_root, "test", "input", "scene0.npy")
    ds = FullImageDataset(fn, 4, "kpcn")
    out_tiled, _, _ = evaluate.inference(kpcn_iface, ds, batch_size=4)

    # untiled forward over the whole 192x192 frame
    full = {}
    import jax.numpy as jnp

    raw_tiles = [ds[i][0] for i in range(len(ds))]
    # reconstruct the full-frame batch from the original buffers
    ds2 = FullImageDataset(fn, 4, "kpcn")
    sample = ds2._load_full_buffer()
    batch = {
        k: np.asarray(v)[None] for k, v in sample.items() if v.ndim == 3
    }
    out_full, _ = kpcn_iface.validate_batch(batch)
    out_full = np.asarray(out_full)[0]

    shrink = 20  # (9*4 + 4) // 2 per side for ksize=5
    inner = out_tiled[shrink:-shrink, shrink:-shrink]
    np.testing.assert_allclose(inner, out_full, rtol=1e-4, atol=1e-5)


def test_auto_padding_nondivisible_frame(tmp_path, kpcn_iface):
    """Frames violating the stride-64 grid (e.g. 1080 rows) are
    replicate-padded and the output cropped back (the reference asserts
    instead, datasets.py:1278)."""
    rng2 = np.random.default_rng(11)
    root = tmp_path / "oddsize"
    (root / "test" / "gt").mkdir(parents=True)
    (root / "test" / "input").mkdir(parents=True)
    gt = synthetic_ground_truth(rng2, 136, 200)   # 136, 200 not on grid
    raw, _ = synthetic_raw_sample(rng2, 136, 200, 2, gt=gt)
    np.save(root / "test" / "gt" / "s.npy", gt)
    np.save(root / "test" / "input" / "s.npy", raw)
    offline_preprocess(str(root), mode="test", spp=2, test_spps=(2,))

    ds = FullImageDataset(
        os.path.join(str(root), "test", "input", "s.npy"), 2, "kpcn"
    )
    assert (ds.orig_h, ds.orig_w) == (136, 200)
    # KPCN default stride 72 / margin 28 (see FullImageDataset)
    assert (ds.h - 2 * ds.pad_h) % 72 == 0
    assert (ds.w - 2 * ds.pad_w) % 72 == 0
    out_rad, _, _ = evaluate.inference(kpcn_iface, ds, batch_size=4)
    assert out_rad.shape == (136, 200, 3)
    assert np.isfinite(out_rad).all()


def test_evaluate_frame_grid(eval_root, kpcn_iface):
    fn = os.path.join(eval_root, "test", "input", "scene0.npy")
    ds = FullImageDataset(fn, 4, "kpcn")
    out_rad, _, _ = evaluate.inference(kpcn_iface, ds, batch_size=4)
    oh, ow = ds.orig_h, ds.orig_w
    res, res_in = evaluate.evaluate_frame(
        out_rad, ds.full_tgt[:oh, :ow], ds.full_ipt[:oh, :ow],
        ds.has_hit[:oh, :ow],
    )
    assert len(res) == 20  # 5 metrics x 4 tonemaps
    for k, v in res.items():
        assert np.isfinite(v), k
    assert "linear_RelMSE" in res and "gamma22_DSSIM" in res


def test_denoise_sweep_writes_csv(eval_root, kpcn_iface, tmp_path):
    out_dir = str(tmp_path / "eval_out")
    results = evaluate.denoise(
        kpcn_iface,
        os.path.join(eval_root, "test", "input"),
        "kpcn",
        spps=(2, 4),
        output_dir=out_dir,
        save_figures=True,
    )
    assert ("scene0", 2) in results and ("scene0", 4) in results
    assert os.path.isfile(os.path.join(out_dir, "results_4.csv"))
    assert os.path.isfile(os.path.join(out_dir, "results_input_4.csv"))
    assert os.path.isfile(os.path.join(out_dir, "scene0", "output_4.png"))
    # denoised error should beat the noisy input on most metrics for a
    # random-init net this may not hold; just require finite values
    for v in results.values():
        assert np.isfinite(v["output"]["linear_RelMSE"])


def test_inference_bounds_in_flight_window(tmp_path, kpcn_iface):
    """Pending device outputs must not accumulate for the whole frame
    (unbounded device memory at high spp): peak in-flight batches is
    the fixed window, not n_batches."""
    rng2 = np.random.default_rng(13)
    root = tmp_path / "bigframe"
    (root / "test" / "gt").mkdir(parents=True)
    (root / "test" / "input").mkdir(parents=True)
    gt = synthetic_ground_truth(rng2, 256, 256)   # 3x3 = 9 tiles
    raw, _ = synthetic_raw_sample(rng2, 256, 256, 2, gt=gt)
    np.save(root / "test" / "gt" / "s.npy", gt)
    np.save(root / "test" / "input" / "s.npy", raw)
    offline_preprocess(str(root), mode="test", spp=2, test_spps=(2,))
    fn = os.path.join(str(root), "test", "input", "s.npy")
    ds = FullImageDataset(fn, 2, "kpcn")
    assert len(ds) >= 8, "fixture frame too small to exercise the window"

    events = []
    real_validate = kpcn_iface.validate_batch
    real_pad = evaluate._replicate_pad

    def tracked_validate(batch):
        events.append("dispatch")
        return real_validate(batch)

    def tracked_pad(x, th, tw):
        events.append("assemble")
        return real_pad(x, th, tw)

    kpcn_iface.validate_batch = tracked_validate
    evaluate._replicate_pad = tracked_pad
    try:
        evaluate.inference(kpcn_iface, ds, batch_size=1)
    finally:
        kpcn_iface.validate_batch = real_validate
        evaluate._replicate_pad = real_pad

    in_flight = peak = 0
    for e in events:
        in_flight += 1 if e == "dispatch" else -1
        peak = max(peak, in_flight)
    n_batches = events.count("dispatch")
    assert n_batches == len(ds)
    assert peak <= 4, f"peak in-flight {peak} (of {n_batches} batches)"


def test_large_square_tile_clamped(monkeypatch):
    """512x512 square tiles hit a >9-min XLA compile (round-3 finding);
    denoise() must clamp them to 256 with a warning, keep full-width
    bands untouched, and honor the override env var."""
    monkeypatch.delenv("WCMC_ALLOW_LARGE_TILES", raising=False)
    with pytest.warns(UserWarning, match="clamped to 256"):
        assert evaluate._clamp_pathological_tile(512, 512) == (256, 256)
    # bands and small tiles pass through
    assert evaluate._clamp_pathological_tile(128, 1920) == (128, 1920)
    assert evaluate._clamp_pathological_tile(256, 256) == (256, 256)
    assert evaluate._clamp_pathological_tile(None, None) == (None, None)
    monkeypatch.setenv("WCMC_ALLOW_LARGE_TILES", "1")
    assert evaluate._clamp_pathological_tile(512, 512) == (512, 512)


def test_band_tiled_inference_matches_untiled(eval_root, kpcn_iface):
    """Wide-band device tiles (tile_h x full width) must assemble to
    the same output as the 128-px tiling and the untiled forward."""
    fn = os.path.join(eval_root, "test", "input", "scene0.npy")
    ds_sq = FullImageDataset(fn, 4, "kpcn")
    out_sq, _, _ = evaluate.inference(kpcn_iface, ds_sq, batch_size=4)

    ds_band = FullImageDataset(fn, 4, "kpcn", tile_h=128, tile_w=192)
    assert len(ds_band) == 2  # two full-width bands
    out_band, _, _ = evaluate.inference(kpcn_iface, ds_band, batch_size=1)

    shrink = 20
    np.testing.assert_allclose(
        out_band[shrink:-shrink, shrink:-shrink],
        out_sq[shrink:-shrink, shrink:-shrink],
        rtol=1e-4, atol=1e-5,
    )
