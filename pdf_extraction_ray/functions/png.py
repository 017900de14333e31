"""Minimal pure-stdlib PNG encoder (8-bit grayscale) — no imaging
library exists in this environment, but PNG is just zlib + CRC framing,
so the debug-overlay sink can emit REAL renderable images
(hybrid_docling_gpt4_processor.py:591-662 draws overlay rasters with
PIL; this is the dependency-free equivalent for the structured
overlay records)."""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png_gray(img: np.ndarray) -> bytes:
    """uint8 (H, W) -> PNG bytes (grayscale, bit depth 8, filter 0)."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("expected uint8 (H, W) image")
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # gray, no interlace
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), img], axis=1).tobytes()
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))


def decode_png_gray_size(png: bytes) -> tuple[int, int]:
    """Parse (width, height) from a PNG produced above (test helper)."""
    if png[:8] != _SIG:
        raise ValueError("not a PNG")
    w, h = struct.unpack(">II", png[16:24])
    return w, h


def draw_rect(img: np.ndarray, x0: float, y0: float, x1: float, y1: float,
              value: int, thickness: int = 1) -> None:
    """Draw a rectangle outline in-place; coords normalized [0, 1]."""
    hgt, wid = img.shape
    px0 = int(np.clip(x0 * (wid - 1), 0, wid - 1))
    px1 = int(np.clip(x1 * (wid - 1), 0, wid - 1))
    py0 = int(np.clip(y0 * (hgt - 1), 0, hgt - 1))
    py1 = int(np.clip(y1 * (hgt - 1), 0, hgt - 1))
    if px1 < px0 or py1 < py0:
        return
    t = max(1, thickness)
    img[py0:py0 + t, px0:px1 + 1] = value
    img[max(0, py1 - t + 1):py1 + 1, px0:px1 + 1] = value
    img[py0:py1 + 1, px0:px0 + t] = value
    img[py0:py1 + 1, max(0, px1 - t + 1):px1 + 1] = value
