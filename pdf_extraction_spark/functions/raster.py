"""Deterministic raster codec + photo-likeness spec (pure Python/numpy).

The reference classifies figure images with two concrete rules
(figure_ocr.py):

* F4 photo-likeness (figure_ocr.py:127-138): downsample to 64x64,
  ``color_ratio = n_distinct_colors / 4096 > 0.28`` AND mean HSV
  saturation ``> 55``;
* F5 textless figure (figure_ocr.py:24-25, 254-259): fewer than 1
  OCR token matching ``[0-9A-Za-z가-힣]`` — a textless photo is
  skipped.

This container has no PIL, so payloads use SPM — a trivial
deterministic container (magic ``SPM1`` + u16 width + u16 height +
row-major RGB bytes).  The RULE is the reference's, byte-math included
(saturation = (max-min)/max scaled to 0..255, PIL HSV convention); only
the container codec differs, documented here.  A deployment swaps
``decode_spm`` for ``PIL.Image.open`` behind the same array interface.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"SPM1"
COLOR_RATIO_THRESHOLD = 0.28  # figure_ocr.py:137
SAT_MEAN_THRESHOLD = 55.0  # figure_ocr.py:138
TEXT_TOKEN_PATTERN = r"[0-9A-Za-z가-힣]"  # figure_ocr.py:25
FIGURE_TEXT_MIN_TOKENS = 1  # figure_ocr.py:24


def encode_spm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> SPM payload."""
    h, w, c = pixels.shape
    assert c == 3
    return MAGIC + struct.pack("<HH", w, h) + pixels.astype(np.uint8).tobytes()


def decode_spm(payload: bytes) -> np.ndarray:
    """SPM payload -> (h, w, 3) uint8; raises ValueError on anything
    that is not a complete SPM container (the decoder-raises contract)."""
    if len(payload) < 8 or payload[:4] != MAGIC:
        raise ValueError("not an SPM payload")
    w, h = struct.unpack("<HH", payload[4:8])
    body = payload[8:]
    if len(body) != w * h * 3:
        raise ValueError("truncated SPM payload")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)


def _resize_nearest(px: np.ndarray, size: int = 64) -> np.ndarray:
    h, w, _ = px.shape
    ys = (np.arange(size) * h // size).clip(0, h - 1)
    xs = (np.arange(size) * w // size).clip(0, w - 1)
    return px[ys][:, xs]


def photo_metrics(px: np.ndarray) -> tuple[float, float]:
    """(color_ratio, sat_mean) per the reference formulas:
    color_ratio over the 64x64 downsample; saturation over the full
    image ((max-min)/max * 255, 0 where max == 0 — PIL HSV scale)."""
    small = _resize_nearest(px, 64).reshape(-1, 3)
    colors = np.unique(small, axis=0)
    color_ratio = len(colors) / (64 * 64)
    f = px.reshape(-1, 3).astype(np.float64)
    mx = f.max(axis=1)
    mn = f.min(axis=1)
    sat = np.where(mx > 0, (mx - mn) / np.where(mx > 0, mx, 1.0) * 255.0, 0.0)
    return float(color_ratio), float(sat.mean())


def is_photo_like(payload: bytes) -> bool:
    """F4 (figure_ocr.py:127-138) over an SPM payload; False on decode
    failure, matching the reference's OSError guard."""
    try:
        px = decode_spm(payload)
    except ValueError:
        return False
    color_ratio, sat_mean = photo_metrics(px)
    return color_ratio > COLOR_RATIO_THRESHOLD and sat_mean > SAT_MEAN_THRESHOLD
