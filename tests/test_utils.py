"""Utility layer: image IO, tonemaps, crop_like, observability, stats,
native loader."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from wcmc_tpu.utils import img_utils
from wcmc_tpu.utils.observability import MetricsWriter, StepTimer
from wcmc_tpu.utils.utils import (
    crop_like,
    linear_to_srgb,
    tonemap_batch,
    tonemap_reinhard,
    tonemap_reinhard_lum,
)


def test_pfm_roundtrip(tmp_path, rng):
    img = rng.random((17, 23, 3)).astype(np.float32) * 10
    p = str(tmp_path / "x.pfm")
    img_utils.write_pfm(p, img)
    back, scale = img_utils.read_pfm(p)
    np.testing.assert_array_equal(back, img)
    # grayscale
    g = rng.random((9, 11)).astype(np.float32)
    img_utils.write_pfm(p, g)
    back, _ = img_utils.read_pfm(p)
    np.testing.assert_array_equal(back, g)


def test_png_write_read(tmp_path, rng):
    img = rng.random((8, 8, 3)).astype(np.float32)
    p = str(tmp_path / "x.png")
    img_utils.write_img(p, img)
    back = img_utils.read_img(p)
    assert back.shape == (8, 8, 3)
    np.testing.assert_allclose(back / 255.0, img, atol=1 / 255.0 + 1e-3)


def test_csv_json(tmp_path):
    img_utils.write_csv(str(tmp_path / "a.csv"), [[1, 2], [3, 4]], ["x", "y"])
    assert open(tmp_path / "a.csv").read() == "x,y\n1,2\n3,4\n"
    img_utils.write_json(str(tmp_path / "a.json"),
                         {"a": np.float32(1.5), "b": np.arange(3)})
    import json

    assert json.load(open(tmp_path / "a.json")) == {"a": 1.5, "b": [0, 1, 2]}


def test_crop_like():
    src = jnp.zeros((2, 10, 12, 3))
    tgt = jnp.zeros((2, 6, 6, 3))
    out = crop_like(src, tgt)
    assert out.shape == (2, 6, 6, 3)
    # 5-D sample-space src
    src5 = jnp.zeros((2, 4, 10, 12, 3))
    assert crop_like(src5, tgt).shape == (2, 4, 6, 6, 3)


def test_tonemaps_ranges():
    x = jnp.asarray([[[0.0, 1.0, 100.0]]])
    assert float(tonemap_reinhard(x).max()) <= 1.0
    assert float(linear_to_srgb(x).max()) <= 1.0
    assert float(tonemap_batch(x[None]).max()) <= 1.0
    tm = tonemap_reinhard_lum(x, 1.5)
    assert np.isfinite(np.asarray(tm)).all()


def test_metrics_writer(tmp_path):
    w = MetricsWriter(str(tmp_path / "logs"), use_tensorboard=False)
    w.log(1, {"loss": 0.5})
    w.log(2, {"loss": jnp.float32(0.25)}, prefix="train/")
    w.close()
    lines = open(tmp_path / "logs" / "metrics.jsonl").read().strip().split("\n")
    assert len(lines) == 2
    import json

    assert json.loads(lines[1])["train/loss"] == 0.25


def test_step_timer():
    t = StepTimer(window=3)
    assert np.isnan(t.mean_ms)
    for _ in range(5):
        t.tick()
    assert t.mean_ms >= 0.0


def test_dataset_get_stats(rng, tmp_path):
    from wcmc_tpu.data.dataset import DenoiseDataset, offline_preprocess
    from wcmc_tpu.data.synthetic import (
        synthetic_ground_truth,
        synthetic_raw_sample,
    )

    root = tmp_path / "stats_data"
    (root / "train" / "gt").mkdir(parents=True)
    (root / "train" / "input").mkdir(parents=True)
    gt = synthetic_ground_truth(rng, 160, 160)
    raw, _ = synthetic_raw_sample(rng, 160, 160, 2, gt=gt)
    np.save(root / "train" / "gt" / "s.npy", gt)
    np.save(root / "train" / "input" / "s.npy", raw)
    offline_preprocess(str(root), mode="train", spp=2)
    ds = DenoiseDataset(str(root), 2, "sbmc", "train")
    stats = ds.get_stats(keys=["features"])
    assert stats["features"]["mean"].shape == (90,)
    assert (stats["features"]["std"] >= 0).all()
    assert (stats["features"]["max"] >= stats["features"]["min"]).all()
