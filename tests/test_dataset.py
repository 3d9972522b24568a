"""Disk pipeline: offline preprocessing cache, patch datasets, loaders,
full-image tiling (reference support/datasets.py contracts)."""

import os

import numpy as np
import pytest

from wcmc_tpu.data import schema
from wcmc_tpu.data.dataset import (
    BatchLoader,
    DenoiseDataset,
    MSDenoiseDataset,
    offline_preprocess,
)
from wcmc_tpu.data.full_image import PAD_SIZE, FullImageDataset
from wcmc_tpu.data.synthetic import synthetic_ground_truth, synthetic_raw_sample


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    """Tiny on-disk synthetic dataset + preprocessing caches."""
    root = tmp_path_factory.mktemp("synth")
    rng = np.random.default_rng(0)
    size, spp = 192, 4
    for mode, count in (("train", 2), ("val", 1), ("test", 1)):
        gt_dir = root / mode / "gt"
        in_dir = root / mode / "input"
        gt_dir.mkdir(parents=True)
        in_dir.mkdir(parents=True)
        for i in range(count):
            gt = synthetic_ground_truth(rng, size, size)
            raw, _ = synthetic_raw_sample(rng, size, size, spp, gt=gt,
                                          nan_fraction=1e-5)
            np.save(gt_dir / f"scene{i}.npy", gt)
            np.save(in_dir / f"scene{i}.npy", raw)
            if mode == "test":
                extra, _ = synthetic_raw_sample(rng, size, size, spp, gt=gt)
                np.save(in_dir / f"scene{i}_1.npy", extra)
    for mode in ("train", "val", "test"):
        offline_preprocess(str(root), mode=mode, spp=spp,
                           test_spps=(2, 4, 8))
    return str(root)


def test_cache_files_written(data_root):
    in_dir = os.path.join(data_root, "train", "input")
    files = os.listdir(in_dir)
    assert "scene0_llpm.npy" in files
    assert "scene0_sbmc_s.npy" in files
    assert "scene0_sbmc_p.npy" in files
    assert "scene0_kpcn_4.npy" in files
    assert "scene0_kpcn_2.npy" in files
    assert "scene0_prob_imp.npy" in files
    prob = np.load(os.path.join(in_dir, "scene0_prob_imp.npy"))
    assert prob.shape == (192 - 128, 192 - 128)
    assert abs(prob.sum() - 1.0) < 1e-3
    # test mode gets 8-spp buffer from concatenated parts
    test_in = os.path.join(data_root, "test", "input")
    assert "scene0_kpcn_8.npy" in os.listdir(test_in)


def test_kpcn_dataset_patches(data_root):
    ds = DenoiseDataset(data_root, 4, "kpcn", "train", batch_size=4,
                        use_llpm_buf=True)
    assert ds.dncnn_in_size == 34 + 3 + 2
    patch = ds[0]
    assert patch["kpcn_diffuse_in"].shape == (128, 128, 35)
    assert patch["kpcn_specular_in"].shape == (128, 128, 35)
    assert patch["paths"].shape == (4, 128, 128, 36)
    assert patch["target_total"].shape == (128, 128, 3)
    # second patch from the same image uses the cached cut
    patch2 = ds[1]
    assert patch2["kpcn_albedo"].shape == (128, 128, 3)


def test_sbmc_dataset_patches(data_root):
    ds = DenoiseDataset(data_root, 4, "sbmc", "train", batch_size=4,
                        use_sbmc_buf=True, use_llpm_buf=False)
    patch = ds[0]
    assert patch["radiance"].shape == (4, 128, 128, 3)
    assert patch["features"].shape == (4, 128, 128, 24 + 66)
    assert patch["target_image"].shape == (128, 128, 3)


def test_lbmc_dataset_maps_to_sbmc_g_only(data_root):
    ds = DenoiseDataset(data_root, 4, "lbmc", "train", batch_size=4)
    patch = ds[0]
    assert patch["features"].shape == (4, 128, 128, 24)
    assert ds.dncnn_in_size == 24


def test_multispp_dataset(data_root):
    ds = MSDenoiseDataset(data_root, 4, "kpcn", "train", batch_size=4)
    # spp 2..4 -> 3 sub-datasets
    assert len(ds.datasets) == 3
    assert len(ds) == sum(len(d) for d in ds.datasets)
    first = ds[0]
    last = ds[len(ds) - 1]
    assert first["kpcn_diffuse_in"].shape == last["kpcn_diffuse_in"].shape


def test_batch_loader_collates(data_root):
    ds = DenoiseDataset(data_root, 4, "kpcn", "val", batch_size=2,
                        sampling="grid")
    loader = BatchLoader(ds, batch_size=2)
    batch = next(iter(loader))
    assert batch["kpcn_diffuse_in"].shape == (2, 128, 128, 34)
    assert len(loader) == len(ds) // 2


def test_batch_loader_never_mixes_shapes():
    """Multi-spp boundaries must start a fresh batch (different S dims
    cannot be stacked)."""

    class FakeDS:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            s = 2 if i < 3 else 4   # spp changes at i=3
            return {"radiance": np.zeros((s, 8, 8, 3), np.float32)}

    loader = BatchLoader(FakeDS(), batch_size=2)
    batches = list(loader)
    shapes = [b["radiance"].shape for b in batches]
    assert (2, 2, 8, 8, 3) in shapes and (2, 4, 8, 8, 3) in shapes
    for b in batches:
        assert b["radiance"].shape[0] == 2


def test_batch_loader_flushes_partial_at_boundary():
    """With drop_last=False the pending partial batch at a shape
    boundary is yielded, not dropped."""

    class FakeDS:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            s = 2 if i < 3 else 4   # boundary at i=3 with 1 pending
            return {"radiance": np.full((s, 8, 8, 3), i, np.float32)}

    batches = list(BatchLoader(FakeDS(), batch_size=2, drop_last=False))
    shapes = [b["radiance"].shape for b in batches]
    assert shapes == [(2, 2, 8, 8, 3), (1, 2, 8, 8, 3), (2, 4, 8, 8, 3)]
    assert batches[1]["radiance"][0, 0, 0, 0, 0] == 2  # the flushed item

    # drop_last=True still drops both the boundary partial and the tail
    batches = list(BatchLoader(FakeDS(), batch_size=2, drop_last=True))
    assert [b["radiance"].shape for b in batches] == \
        [(2, 2, 8, 8, 3), (2, 4, 8, 8, 3)]


def test_full_image_dataset_tiling(data_root):
    fn = os.path.join(data_root, "test", "input", "scene0.npy")
    # KPCN default: stride 72 / margin 28 (full VALID output per tile)
    ds = FullImageDataset(fn, 4, "kpcn", use_llpm_buf=True)
    assert ds.pad_h == ds.pad_w == 28
    assert (ds.h - 2 * ds.pad_h) % 72 == 0
    tile, coords = ds[0]
    assert tile["kpcn_diffuse_in"].shape == (128, 128, 35)
    # interior coords cover the padded canvas exactly once
    canvas = np.zeros((ds.h, ds.w), np.int32)
    for i in range(len(ds)):
        _, (i0, j0, i1, j1, _, _) = ds[i]
        canvas[i0:i1, j0:j1] += 1
    assert (canvas == 1).all()

    # reference-exact tiling (stride 64) still available
    ds64 = FullImageDataset(fn, 4, "kpcn", use_llpm_buf=True, stride=64)
    assert ds64.h == 192 and ds64.w == 192
    stride = 128 - 2 * PAD_SIZE
    assert len(ds64) == ((192 - 2 * PAD_SIZE) // stride) ** 2
    assert ds64.has_hit.shape == (192, 192, 3)


def test_full_image_multispp_parts(data_root):
    fn = os.path.join(data_root, "test", "input", "scene0.npy")
    ds = FullImageDataset(fn, 8, "sbmc", use_sbmc_buf=True)
    tile, _ = ds[0]
    assert tile["radiance"].shape == (8, 128, 128, 3)


def test_augmentation_flag(data_root):
    """augment=True applies flips/rotations; shapes and finiteness hold
    (the reference defines but disables augmentation,
    datasets.py:718-758)."""
    ds = DenoiseDataset(data_root, 4, "kpcn", "train", batch_size=4,
                        augment=True, seed=3)
    patch = ds[0]
    assert patch["kpcn_diffuse_in"].shape == (128, 128, 34)
    assert np.isfinite(patch["kpcn_diffuse_in"]).all()


def test_random_flip_rot_are_involutions(rng):
    patch = {"a": rng.random((8, 8, 3)).astype(np.float32)}
    flipped = DenoiseDataset.random_flip(
        dict(patch), np.random.default_rng(1)
    )
    assert flipped["a"].shape == (8, 8, 3)
    rot = DenoiseDataset.random_rot(dict(patch), np.random.default_rng(2))
    assert rot["a"].shape == (8, 8, 3)
    # rotating 4x by the same k returns the original
    k = 1
    r = patch["a"]
    for _ in range(4):
        r = np.rot90(r, k, axes=(0, 1))
    np.testing.assert_array_equal(r, patch["a"])


def test_get_valid_path_fallback(tmp_path):
    from wcmc_tpu.data.dataset import get_valid_path

    real = tmp_path / "alt" / "train" / "gt"
    real.mkdir(parents=True)
    (real / "x.npy").write_bytes(b"00")
    missing = str(tmp_path / "gone" / "train" / "gt" / "x.npy")
    found = get_valid_path(missing, fallback_roots=[str(tmp_path / "alt")])
    assert found == str(real / "x.npy")
    with pytest.raises(FileNotFoundError):
        get_valid_path(missing, fallback_roots=[])


def test_grid_sampling_deterministic(data_root):
    ds1 = DenoiseDataset(data_root, 4, "kpcn", "val", sampling="grid")
    ds2 = DenoiseDataset(data_root, 4, "kpcn", "val", sampling="grid")
    np.testing.assert_array_equal(
        ds1[0]["kpcn_diffuse_in"], ds2[0]["kpcn_diffuse_in"]
    )


def test_shuffle_loader_covers_all_patches(data_root):
    """ShuffleLoader must serve every patch exactly once per epoch,
    with cross-image mixing and epoch-varying order."""
    from wcmc_tpu.data.dataset import ShuffleLoader

    ds = DenoiseDataset(data_root, 4, "kpcn", "train", batch_size=2,
                        sampling="grid", patches_per_image=4)
    loader = ShuffleLoader(ds, batch_size=2, window_images=2, workers=2,
                           seed=7)
    n_imgs = len(ds.gt_files)

    def epoch_sums():
        sums = []
        for batch in loader:
            assert batch["kpcn_diffuse_in"].shape == (2, 128, 128, 34)
            sums.extend(
                float(x) for x in
                batch["kpcn_diffuse_in"].sum(axis=(1, 2, 3))
            )
        return sums

    e1, e2 = epoch_sums(), epoch_sums()
    assert len(e1) == n_imgs * 4 == len(loader) * 2
    # same multiset of patches each epoch (grid sampling is
    # deterministic), different order (shuffled)
    assert sorted(e1) == pytest.approx(sorted(e2))
    assert e1 != e2


def test_load_patches_owns_memory(data_root):
    """Patches must own their buffers: ShuffleLoader's shuffle buffer
    holds patches from many images at once, and a view would pin the
    whole per-image (N, S, P, P, C) gather until the last straggler is
    served (observed 130 GB RSS -> host OOM on the 33 GB corpus)."""
    ds = DenoiseDataset(data_root, 4, "kpcn", "train", batch_size=2,
                        sampling="grid", patches_per_image=4,
                        use_llpm_buf=True)
    for patch in ds.load_patches(0):
        for k, v in patch.items():
            assert v.base is None, f"{k} is a view (pins the image gather)"


def test_shuffle_loader_never_mixes_shapes():
    from wcmc_tpu.data.dataset import ShuffleLoader

    class FakeDS:
        gt_files = ["a", "b", "c"]

        def __len__(self):
            return 12

        def load_image_and_coords(self, img, rng=None):
            s = 2 if img < 2 else 4
            sample = {"radiance": np.full((8, 8, s, 3), img, np.float32)}
            return sample, [(0, 0)] * 4

        augment = False

        def cut_patch(self, sample, x, y, rng=None):
            return {"radiance": np.transpose(sample["radiance"],
                                             (2, 0, 1, 3)).copy()}

        def cut_patch_into(self, sample, x, y, out, i):
            out["radiance"][i] = np.transpose(sample["radiance"],
                                              (2, 0, 1, 3))

    loader = ShuffleLoader(FakeDS(), batch_size=4, window_images=3,
                           workers=2, seed=0)
    batches = list(loader)
    served = 0
    for b in batches:
        assert b["radiance"].shape[0] == 4
        assert b["radiance"].shape[1] in (2, 4)
        served += b["radiance"].shape[0]
    assert served == 12


def test_serve_paths_bf16(data_root):
    """serve_paths_dtype='bfloat16' must serve paths in bf16 with the
    same values (up to bf16 rounding) and leave every other tensor
    f32 — the single-core host is memcpy-bound and paths carry 77% of
    the batch bytes (see DenoiseDataset.__init__ NOTE(perf))."""
    import ml_dtypes

    kw = dict(base_model="kpcn", mode="train", sampling="grid",
              patches_per_image=2, use_llpm_buf=True)
    ds32 = DenoiseDataset(data_root, 4, **kw)
    ds16 = DenoiseDataset(data_root, 4, serve_paths_dtype="bfloat16", **kw)
    p32, p16 = ds32[0], ds16[0]
    assert p16["paths"].dtype == np.dtype(ml_dtypes.bfloat16)
    assert p16["kpcn_diffuse_in"].dtype == np.float32
    np.testing.assert_allclose(
        p16["paths"].astype(np.float32), p32["paths"], rtol=8e-3, atol=1e-6
    )
