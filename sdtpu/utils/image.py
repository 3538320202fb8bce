"""Host-side image utilities (reference: rescale/clamp at
``pipeline.mojo:124-127``, nearest resize ``utils.mojo:372-402``; the
reference never writes an image file — ``demo.mojo`` drops the result)."""

from __future__ import annotations

import numpy as np


def to_uint8(images) -> np.ndarray:
    """(-1, 1) float images -> clamped uint8 (pipeline.mojo:127's
    rescale((-1,1),(0,255), clamp=True))."""
    arr = np.asarray(images, dtype=np.float32)
    arr = (arr + 1.0) * 127.5
    return np.clip(np.round(arr), 0, 255).astype(np.uint8)


def from_uint8(images) -> np.ndarray:
    """uint8 [0,255] -> float32 (-1, 1) (pipeline.mojo:70's rescale)."""
    return np.asarray(images, dtype=np.float32) / 127.5 - 1.0


def psnr(a, b, *, data_range: float = 2.0) -> float:
    """Peak signal-to-noise ratio in dB (default range 2.0 for [-1,1]
    images) — the fidelity metric of the BASELINE north star."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / mse))


def bilinear_resize(images: np.ndarray, height: int, width: int) -> np.ndarray:
    """Host-side bilinear resize of a (B, H, W, C) float batch with
    half-pixel-center sampling (matches ``jax.image.resize(..., "bilinear")``
    exactly for UPSCALING; downscaling is plain 2-tap sampling without jax's
    antialias prefilter).  Used between hires-fix passes — always an upscale —
    so no eager device program is dispatched on the relay-backed TPU
    backend."""
    arr = np.asarray(images, dtype=np.float32)
    b, h, w, c = arr.shape
    if (h, w) == (height, width):
        return arr

    def axis_weights(n_in, n_out):
        # half-pixel centers: src = (dst + 0.5) * n_in / n_out - 0.5,
        # clamped into [0, n_in - 1] BEFORE the floor so edge samples
        # extend the border (matches jax's past-the-edge behavior)
        src = (np.arange(n_out, dtype=np.float64) + 0.5) * n_in / n_out - 0.5
        src = np.clip(src, 0.0, n_in - 1)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        frac = (src - lo).astype(np.float32)
        return lo, hi, frac

    ylo, yhi, yf = axis_weights(h, height)
    xlo, xhi, xf = axis_weights(w, width)
    top = arr[:, ylo]
    bot = arr[:, yhi]
    rows = top + (bot - top) * yf[None, :, None, None]
    left = rows[:, :, xlo]
    right = rows[:, :, xhi]
    return left + (right - left) * xf[None, None, :, None]


def save_png(image: np.ndarray, path: str) -> None:
    from PIL import Image

    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = to_uint8(arr)
    if arr.ndim == 4:
        arr = arr[0]
    Image.fromarray(arr).save(path)


def load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))
