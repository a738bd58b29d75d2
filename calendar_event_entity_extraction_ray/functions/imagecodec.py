"""Pure-numpy image codec for uncompressed binary PPM (P6).

The one REAL pixel kernel this container can support without codec
libraries: P6 is a trivial header + raw RGB24 payload, so decode/encode and
nearest-neighbor resize are exact numpy operations. JPEG/PNG/audio/video
remain honestly stubbed in ``stages/multimodal.py`` (strict mode raises).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM (P6, maxval 255)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (H, W, 3) RGB array")
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w = arr.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode("ascii") + arr.tobytes()


def _read_header_tokens(data: bytes, n_tokens: int) -> Tuple[list, int]:
    """Read ``n_tokens`` whitespace-separated header tokens (with ``#``
    comment support) and return (tokens, offset_of_pixel_data)."""
    tokens: list = []
    i = 0
    while len(tokens) < n_tokens:
        if i >= len(data):
            raise ValueError("truncated PPM header")
        c = data[i:i + 1]
        if c == b"#":
            while i < len(data) and data[i:i + 1] != b"\n":
                i += 1
            i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(data) and not data[j:j + 1].isspace():
                j += 1
            tokens.append(data[i:j])
            i = j
    return tokens, i + 1  # single whitespace byte after maxval


def is_ppm(data: bytes) -> bool:
    return bool(data) and data[:2] == b"P6"


def decode_ppm(data: bytes) -> np.ndarray:
    """binary PPM (P6) -> (H, W, 3) uint8 (maxval must be 255)."""
    if not is_ppm(data):
        raise ValueError("not a P6 PPM payload")
    tokens, off = _read_header_tokens(data, 4)
    if tokens[0] != b"P6":
        raise ValueError("not a P6 PPM payload")
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    need = w * h * 3
    pix = np.frombuffer(data, dtype=np.uint8, count=need, offset=off)
    if pix.size < need:
        raise ValueError("truncated PPM pixel data")
    return pix.reshape(h, w, 3)


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy index maps (no interpolation lib)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[ys][:, xs]


def channel_stats(pixels: np.ndarray) -> dict:
    """Exact per-channel statistics for the feature stage / oracle."""
    flat = pixels.reshape(-1, 3).astype(np.float64)
    means = flat.mean(axis=0)
    stds = flat.std(axis=0)
    return {
        "px_width": int(pixels.shape[1]),
        "px_height": int(pixels.shape[0]),
        "mean_r_e4": int(np.floor(means[0] * 10_000 + 0.5)),
        "mean_g_e4": int(np.floor(means[1] * 10_000 + 0.5)),
        "mean_b_e4": int(np.floor(means[2] * 10_000 + 0.5)),
        "std_gray_e4": int(np.floor(
            flat.mean(axis=1).std() * 10_000 + 0.5)),
        "_means": means,
        "_stds": stds,
    }


_DCT32 = None


def _dct32() -> np.ndarray:
    """32x32 DCT-II basis (cached): D[k, m] = cos(pi*(m+0.5)*k/32)."""
    global _DCT32
    if _DCT32 is None:
        k = np.arange(32, dtype=np.float64)[:, None]
        m = np.arange(32, dtype=np.float64)[None, :]
        _DCT32 = np.cos(np.pi * (m + 0.5) * k / 32.0)
    return _DCT32


def phash64(pixels: np.ndarray) -> int:
    """Perceptual 64-bit image hash (the classic pHash plan, all numpy):
    gray (channel mean, matching ``channel_stats``'s gray) -> 32x32
    nearest resize -> 2-D DCT-II via two matmuls -> top-left 8x8
    low-frequency block -> bit i = coef_i > median(coefs[1:]) (DC
    excluded from the median so flat images don't flip half their
    bits). Deterministic float64 end to end — the distributed stage and
    the golden mirror share this exact kernel."""
    g = pixels.astype(np.float64).mean(axis=2)
    g32 = resize_nearest(g, 32, 32)
    d = _dct32()
    low = (d @ g32 @ d.T)[:8, :8].ravel()
    med = np.median(low[1:])
    bits = low > med
    out = 0
    for i in np.nonzero(bits)[0]:
        out |= 1 << int(i)
    return out
