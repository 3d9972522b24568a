"""Device-resident corpus with on-device patch extraction."""

import numpy as np
import pytest

from wcmc_tpu.data.device_corpus import DeviceCorpus


def _frames(n=3, h=16, w=20, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {
            "img": rng.standard_normal((1, h, w, 2)).astype(np.float32),
            "samp": rng.standard_normal((1, 4, h, w, 3)).astype(np.float32),
        }
        for _ in range(n)
    ]


def test_crop_matches_numpy_slices():
    frames = _frames()
    corpus = DeviceCorpus(frames, patch=8)
    ids, ys, xs = np.array([2, 0]), np.array([3, 8]), np.array([5, 0])
    batch = corpus.crop(ids, ys, xs)
    assert batch["img"].shape == (2, 8, 8, 2)
    assert batch["samp"].shape == (2, 4, 8, 8, 3)
    for j, (i, y, x) in enumerate(zip(ids, ys, xs)):
        np.testing.assert_array_equal(
            np.asarray(batch["img"][j]),
            frames[i]["img"][0, y:y + 8, x:x + 8],
        )
        np.testing.assert_array_equal(
            np.asarray(batch["samp"][j]),
            frames[i]["samp"][0, :, y:y + 8, x:x + 8],
        )


def test_sample_batch_shapes_and_bounds():
    corpus = DeviceCorpus(_frames(), patch=8)
    rng = np.random.default_rng(1)
    b = corpus.sample_batch(rng, 4)
    assert b["img"].shape == (4, 8, 8, 2)
    # two draws differ (fresh patches, not a fixed corpus)
    b2 = corpus.sample_batch(rng, 4)
    assert not np.array_equal(np.asarray(b["img"]), np.asarray(b2["img"]))


def test_importance_sampling_concentrates():
    frames = _frames(n=2)
    h, w, patch = 16, 20, 8
    # all mass on offset (1, 2) for both scenes
    imp = np.zeros((h - patch + 1, w - patch + 1))
    imp[1, 2] = 1.0
    corpus = DeviceCorpus(frames, patch=patch, importance=[imp, imp])
    rng = np.random.default_rng(2)
    batch = corpus.sample_batch(rng, 3)
    for j in range(3):
        got = np.asarray(batch["img"][j])
        assert any(
            np.array_equal(got, f["img"][0, 1:1 + patch, 2:2 + patch])
            for f in frames
        )


def test_grid_batches_cover_corpus():
    corpus = DeviceCorpus(_frames(n=2, h=16, w=16), patch=8)
    batches = list(corpus.grid_batches(2))
    # 2 scenes x 2x2 grid = 8 patches -> 4 batches of 2
    assert len(batches) == 4
    assert all(b["img"].shape == (2, 8, 8, 2) for b in batches)


def test_cast_hook():
    import jax.numpy as jnp

    corpus = DeviceCorpus(
        _frames(), patch=8,
        cast=lambda k, v: v.astype(jnp.bfloat16) if k == "samp" else v,
    )
    assert corpus.frames["samp"].dtype == jnp.bfloat16
    assert corpus.frames["img"].dtype == jnp.float32
    assert corpus.nbytes() > 0
