"""Full-frame tiled inference + the 5x4 evaluation metric grid.

Counterpart of reference test_models.py: overlap-tiled inference with
replicate padding and interior-crop assembly (test_models.py:49-101),
28 px boundary crop (valid_size 72, test_models.py:217-228),
background/emitter passthrough via ``has_hit`` (test_models.py:230-232),
and the {RelMSE, RelL1, DSSIM, L1, MSE} x {linear, Reinhard, gamma 2.2,
adaptive gamma 2.8} CSV grid (test_models.py:113,247-277).
"""

from __future__ import annotations

import os
import time

import numpy as np

from wcmc_tpu import metrics as M
from wcmc_tpu.data.full_image import FullImageDataset

VALID_SIZE = 72
PATCH_SIZE = 128


def tonemap(c, ref=None, k_inv_gamma=1.0 / 2.2):
    """Adaptive-luminance tonemap (reference test_models.py:24-34)."""
    if ref is None:
        ref = c
    lum = 0.2126 * ref[..., 0] + 0.7152 * ref[..., 1] + 0.0722 * ref[..., 2]
    col = np.copy(c) / (1.0 + lum / 1.5)[..., None]
    col = np.clip(col, 0, None)
    return np.clip(col ** k_inv_gamma, 0.0, 1.0)


METRICS = [M.RelMSE, M.RelL1, M.SSIM, M.L1, M.MSE]
METRIC_NAMES = ["RelMSE", "RelL1", "DSSIM", "L1", "MSE"]
TMAPS = [
    lambda x: x,
    M.tonemap_simple,
    tonemap,
    lambda x: tonemap(x, k_inv_gamma=1.0 / 2.8),
]
TMAP_NAMES = ["linear", "reinhard", "gamma22", "gamma28"]


def _replicate_pad(tile: np.ndarray, target_h: int,
                   target_w: int) -> np.ndarray:
    """Edge-replicate a (B, h, w, C) tile back to (B, th, tw, C)
    (reference test_models.py:67-70)."""
    pad_h = target_h - tile.shape[1]
    pad_w = target_w - tile.shape[2]
    if pad_h == 0 and pad_w == 0:
        return tile
    return np.pad(
        tile,
        (
            (0, 0),
            (pad_h // 2, pad_h - pad_h // 2),
            (pad_w // 2, pad_w - pad_w // 2),
            (0, 0),
        ),
        mode="edge",
    )


def inference(interface, dataset: FullImageDataset, batch_size: int = 8):
    """Tiled full-frame inference with interior-crop assembly.

    The tile stream is double-buffered (host collation + device upload
    of batch N+1 overlap the device's work on batch N) and device
    outputs are fetched asynchronously, so the device never idles on
    host IO.

    Returns (out_rad (H, W, 3), out_path or None, elapsed_seconds).
    """
    from wcmc_tpu.data.prefetch import DevicePrefetcher

    interface.to_eval_mode()
    H, W = dataset.h, dataset.w
    out_rad = np.zeros((H, W, 3), np.float32)
    out_path = None
    use_paths = dataset.use_llpm_buf
    t0 = time.time()

    n = len(dataset)

    def batches():
        for start in range(0, n, batch_size):
            idxs = list(range(start, min(start + batch_size, n)))
            tiles = [dataset[i][0] for i in idxs]
            yield {
                k: np.stack([t[k] for t in tiles], axis=0) for k in tiles[0]
            }

    def assemble(idxs, out_dev, p_buffers):
        nonlocal out_path
        coords = [dataset[i][1] for i in idxs]
        out = np.asarray(out_dev)
        out = _replicate_pad(
            out,
            getattr(dataset, "tile_h", PATCH_SIZE),
            getattr(dataset, "tile_w", PATCH_SIZE),
        )

        if use_paths and out_path is None:
            if isinstance(p_buffers, dict):
                out_path = {
                    k: np.zeros(
                        (v.shape[1], H, W, v.shape[-1]), np.float32
                    )
                    for k, v in p_buffers.items()
                }
            else:
                out_path = np.zeros(
                    (p_buffers.shape[1], H, W, p_buffers.shape[-1]),
                    np.float32,
                )

        for b, (i0, j0, i1, j1, i, j) in enumerate(coords):
            out_rad[i0:i1, j0:j1] = out[b, i0 - i:i1 - i, j0 - j:j1 - j]
            if use_paths:
                if isinstance(p_buffers, dict):
                    for k in p_buffers:
                        pb = np.asarray(p_buffers[k])
                        out_path[k][:, i0:i1, j0:j1] = pb[
                            b, :, i0 - i:i1 - i, j0 - j:j1 - j
                        ]
                else:
                    pb = np.asarray(p_buffers)
                    out_path[:, i0:i1, j0:j1] = pb[
                        b, :, i0 - i:i1 - i, j0 - j:j1 - j
                    ]

    # Dispatch ahead of assembly, but bound the in-flight window: each
    # pending entry holds device outputs (incl. per-sample p-buffers),
    # so an unbounded list would scale device memory with frame size at
    # high spp. A window of 3 keeps the device busy while the host
    # paints batch N-3.
    max_in_flight = 3
    pending: list = []
    for start, batch in zip(
        range(0, n, batch_size), DevicePrefetcher(batches(), depth=2)
    ):
        idxs = list(range(start, min(start + batch_size, n)))
        out_dev, p_dev = interface.validate_batch(batch)[:2]
        pending.append((idxs, out_dev, p_dev))
        if len(pending) > max_in_flight:
            assemble(*pending.pop(0))

    for entry in pending:
        assemble(*entry)
    # crop the assembled canvas back to the original frame (the dataset
    # may have auto-padded to the tile grid)
    oh = getattr(dataset, "orig_h", H)
    ow = getattr(dataset, "orig_w", W)
    out_rad = out_rad[:oh, :ow]
    if out_path is not None:
        if isinstance(out_path, dict):
            out_path = {k: v[:, :oh, :ow] for k, v in out_path.items()}
        else:
            out_path = out_path[:, :oh, :ow]
    return out_rad, out_path, time.time() - t0


def evaluate_frame(out_rad, tgt, ipt, has_hit):
    """Boundary crop + passthrough + full metric grid.

    Returns (results, results_input): {tmap}_{metric} -> float.
    """
    crop = (PATCH_SIZE - VALID_SIZE) // 2
    out_rad = out_rad[crop:-crop, crop:-crop]
    tgt = tgt[crop:-crop, crop:-crop]
    ipt = ipt[crop:-crop, crop:-crop]
    hh = has_hit[crop:-crop, crop:-crop]
    out_rad = np.where(hh == 0, ipt, out_rad)

    results, results_input = {}, {}
    for tname, tmap in zip(TMAP_NAMES, TMAPS):
        for mname, metric in zip(METRIC_NAMES, METRICS):
            results[f"{tname}_{mname}"] = float(metric(tmap(out_rad), tmap(tgt)))
            results_input[f"{tname}_{mname}"] = float(
                metric(tmap(ipt), tmap(tgt))
            )
    return results, results_input


def _clamp_pathological_tile(tile_h, tile_w):
    """Guard (round-3 finding): >=512x512 square tiles trigger a
    pathological >9-minute XLA compile through the remote-compile
    tunnel (scripts/repro_512_tile_compile.py is the minimal repro)
    with no throughput win over 256-px tiles (the measured v5e sweet
    spot).  Full-width *bands* (tile_w >> tile_h) are unaffected and
    stay allowed.  Set WCMC_ALLOW_LARGE_TILES=1 to override."""
    if (tile_h or 0) > 384 and (tile_w or 0) > 384 and \
            not os.environ.get("WCMC_ALLOW_LARGE_TILES"):
        import warnings

        warnings.warn(
            f"tile {tile_h}x{tile_w} clamped to 256x256: large square "
            "tiles hit a pathological XLA compile (see "
            "scripts/repro_512_tile_compile.py); set "
            "WCMC_ALLOW_LARGE_TILES=1 to override", stacklevel=3,
        )
        return 256, 256
    return tile_h, tile_w


def denoise(
    interface,
    input_dir: str,
    base_model: str,
    scenes=None,
    spps=(8,),
    output_dir: str = "./eval_out",
    use_g_buf: bool = True,
    use_sbmc_buf: bool = True,
    use_llpm_buf: bool = False,
    pnet_out_size: int = 3,
    save_figures: bool = False,
    rhf: bool = False,
    feat_imp: bool = False,
    batch_size_fn=None,
    tile_h: int | None = None,
    tile_w: int | None = None,
):
    """Scene x spp evaluation sweep -> nested results dict + CSVs.

    ``tile_h``/``tile_w`` select the device tile size (see
    FullImageDataset); with band tiles the batch size defaults to 1.
    """
    if tile_h is None and tile_w is None and base_model == "kpcn" \
            and not use_llpm_buf:
        # NOTE(perf): 256-px tiles are the measured device sweet spot
        # for the pure-conv KPCN (v5e sweep in
        # scripts/bench_inference_1080p.py: 416 ms/1080p-frame vs 628
        # at the reference's 128/64 tiling) and the assembled output
        # is still exactly the untiled forward (28-px interior margin
        # == the model's half-shrink). llpm models keep 128: the
        # PathNet UNet's context is tile-global, so tile size is
        # behavior-relevant there and 128 matches the reference.
        tile_h = tile_w = 256
    tile_h, tile_w = _clamp_pathological_tile(tile_h, tile_w)
    if batch_size_fn is None:
        if (tile_h or PATCH_SIZE) * (tile_w or PATCH_SIZE) > 256 * 256:
            batch_size_fn = lambda spp: 1  # noqa: E731 — band tiles
        else:
            batch_size_fn = lambda spp: 8 if spp <= 32 else 4  # noqa: E731
    assert os.path.isdir(input_dir), input_dir
    gt_dir = input_dir.replace(os.sep + "input", os.sep + "gt")
    if scenes is None:
        scenes = sorted(
            f[:-4] for f in os.listdir(gt_dir)
            if f.endswith(".npy") and "_" not in f
        )
    os.makedirs(output_dir, exist_ok=True)

    all_results = {}
    for scene in scenes:
        scene = scene[:-4] if scene.endswith(".npy") else scene
        for spp in spps:
            ds = FullImageDataset(
                os.path.join(input_dir, scene + ".npy"), spp, base_model,
                use_g_buf, use_sbmc_buf, use_llpm_buf, pnet_out_size,
                feat_imp=feat_imp, tile_h=tile_h, tile_w=tile_w,
            )
            out_rad, out_path, dt = inference(
                interface, ds, batch_size_fn(spp)
            )
            if rhf and out_path is not None:
                # p-buffer export for RHF-style visualization
                # (reference test_models.py:184-194)
                pb = out_path["diffuse"] if isinstance(out_path, dict) else out_path
                np.save(
                    os.path.join(output_dir, f"p_buffer_{scene}_{spp}.npy"),
                    pb,
                )
                return {}
            oh, ow = ds.orig_h, ds.orig_w
            res, res_in = evaluate_frame(
                out_rad, ds.full_tgt[:oh, :ow], ds.full_ipt[:oh, :ow],
                ds.has_hit[:oh, :ow],
            )
            res["inference_sec"] = dt
            all_results[(scene, spp)] = {"output": res, "input": res_in}

            if save_figures:
                import matplotlib

                matplotlib.use("Agg")
                import matplotlib.pyplot as plt

                sdir = os.path.join(output_dir, scene)
                os.makedirs(sdir, exist_ok=True)
                crop = (PATCH_SIZE - VALID_SIZE) // 2
                # full_tgt/full_ipt carry the tile-grid auto-padding;
                # crop to the original frame like out_rad
                tgt = ds.full_tgt[:oh, :ow]
                ipt = ds.full_ipt[:oh, :ow]
                err = M.RelMSE(
                    out_rad[crop:-crop, crop:-crop],
                    tgt[crop:-crop, crop:-crop],
                    reduce=False,
                ).reshape(tgt[crop:-crop, crop:-crop].shape)
                plt.imsave(
                    os.path.join(sdir, "target.png"),
                    TMAPS[-1](tgt),
                )
                plt.imsave(
                    os.path.join(sdir, f"input_{spp}.png"),
                    TMAPS[-1](ipt),
                )
                plt.imsave(
                    os.path.join(sdir, f"output_{spp}.png"),
                    TMAPS[-1](out_rad),
                )
                plt.imsave(
                    os.path.join(sdir, f"errmap_rmse_{spp}.png"),
                    np.mean(np.clip(err**0.45, 0.0, 1.0), axis=2),
                    cmap="magma",
                )

    _write_csv(os.path.join(output_dir, f"results_{spps[-1]}.csv"),
               all_results, "output")
    _write_csv(os.path.join(output_dir, f"results_input_{spps[-1]}.csv"),
               all_results, "input")
    return all_results


def _write_csv(path, all_results, which):
    keys = sorted({k for v in all_results.values() for k in v[which]})
    with open(path, "w") as f:
        f.write("scene,spp," + ",".join(keys) + "\n")
        for (scene, spp), v in sorted(all_results.items()):
            row = [scene, str(spp)] + [
                f"{v[which].get(k, float('nan')):.6g}" for k in keys
            ]
            f.write(",".join(row) + "\n")
