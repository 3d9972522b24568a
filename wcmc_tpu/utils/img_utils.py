"""Image / file IO utilities.

Counterpart of reference support/img_utils.py: PFM (HDR) and PNG
read/write, CSV/JSON dumps.  PFM is implemented natively (the format
is a 3-line header + raw floats, stored bottom-up).
"""

from __future__ import annotations

import json
import struct

import numpy as np


# ---------------------------------------------------------------------------
# PFM (portable float map)
# ---------------------------------------------------------------------------

def write_pfm(path: str, img: np.ndarray, scale: float = 1.0):
    """Write an (H, W) or (H, W, 3) float32 image as PFM (bottom-up)."""
    img = np.asarray(img, np.float32)
    if img.ndim == 3 and img.shape[2] == 3:
        header = b"PF\n"
    elif img.ndim == 2 or (img.ndim == 3 and img.shape[2] == 1):
        header = b"Pf\n"
        img = img.reshape(img.shape[0], img.shape[1])
    else:
        raise ValueError(f"PFM supports 1 or 3 channels, got {img.shape}")
    h, w = img.shape[:2]
    endian = -scale if np.little_endian else scale
    with open(path, "wb") as f:
        f.write(header)
        f.write(f"{w} {h}\n".encode())
        f.write(f"{endian}\n".encode())
        f.write(np.flipud(img).tobytes())


def read_pfm(path: str) -> tuple[np.ndarray, float]:
    """Read a PFM file -> (image (H, W[, 3]) float32, scale)."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            channels = 3
        elif header == b"Pf":
            channels = 1
        else:
            raise ValueError(f"not a PFM file: {path}")
        dims = f.readline().split()
        w, h = int(dims[0]), int(dims[1])
        scale = float(f.readline().rstrip())
        little = scale < 0
        data = np.frombuffer(
            f.read(), dtype="<f4" if little else ">f4",
            count=h * w * channels,
        )
    img = data.reshape(h, w, channels) if channels == 3 else data.reshape(h, w)
    return np.flipud(img).astype(np.float32), abs(scale)


# ---------------------------------------------------------------------------
# PNG / generic image IO (reference WriteImg/ReadImg)
# ---------------------------------------------------------------------------

def write_img(path: str, img: np.ndarray):
    """PFM for .pfm paths, 8-bit image formats otherwise."""
    if path.lower().endswith(".pfm"):
        write_pfm(path, img)
        return
    import imageio.v3 as iio

    arr = np.asarray(img)
    if arr.dtype in (np.float32, np.float64):
        arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
    iio.imwrite(path, arr)


def read_img(path: str) -> np.ndarray:
    if path.lower().endswith(".pfm"):
        return read_pfm(path)[0]
    import imageio.v3 as iio

    return np.asarray(iio.imread(path))


# ---------------------------------------------------------------------------
# Tabular / structured dumps
# ---------------------------------------------------------------------------

def write_csv(path: str, rows, header=None):
    with open(path, "w") as f:
        if header:
            f.write(",".join(str(h) for h in header) + "\n")
        for row in rows:
            f.write(",".join(str(x) for x in row) + "\n")


def write_json(path: str, obj):
    def default(o):
        if isinstance(o, (np.floating, np.integer)):
            return o.item()
        if isinstance(o, np.ndarray):
            return o.tolist()
        raise TypeError(type(o))

    with open(path, "w") as f:
        json.dump(obj, f, indent=2, default=default)


# ---------------------------------------------------------------------------
# Debug viewers (reference ImShow/MatShow/PlotHistogram; file-backed
# since training hosts are headless)
# ---------------------------------------------------------------------------

def im_show(img: np.ndarray, title: str = "img", save_to: str | None = None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.imshow(np.clip(img, 0, 1) if img.dtype.kind == "f" else img)
    ax.set_title(title)
    if save_to:
        fig.savefig(save_to)
    plt.close(fig)


def plot_histogram(values: np.ndarray, bins: int = 100, title: str = "hist",
                   save_to: str | None = None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.hist(np.ravel(values), bins=bins)
    ax.set_title(title)
    if save_to:
        fig.savefig(save_to)
    plt.close(fig)


# reference-style aliases (support/img_utils.py public names)
WriteImg = write_img
ReadImg = read_img
WriteCSV = write_csv
WriteJson = write_json
ImShow = im_show
MatShow = im_show
PlotHistogram = plot_histogram
