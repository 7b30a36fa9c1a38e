"""Image-file output (PPM and PNG) — the reference has no image output at
all (SURVEY.md §5.4: "no image-file output"); these exist for golden-image
tests, benchmarks and offline rendering. PNG is written with stdlib zlib
only (no imaging deps)."""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import numpy as np


def write_ppm(path, rgb: np.ndarray) -> None:
    """Binary PPM (P6) from an [H, W, 3] uint8 array."""
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w = rgb.shape[:2]
    with open(Path(path), "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(rgb.tobytes())


def read_ppm(path) -> np.ndarray:
    data = Path(path).read_bytes()
    if not data.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6)")
    # header: magic, width, height, maxval — whitespace separated, then raster
    fields = []
    i = 2
    while len(fields) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while not data[j : j + 1].isspace():
            j += 1
        fields.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, _maxval = fields
    return np.frombuffer(data[i : i + w * h * 3], np.uint8).reshape(h, w, 3)


def write_png(path, rgb: np.ndarray) -> None:
    """Minimal 8-bit RGB PNG writer (stdlib zlib only)."""
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w = rgb.shape[:2]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    # filter byte 0 (None) per scanline
    raster = np.concatenate(
        [np.zeros((h, 1), np.uint8), rgb.reshape(h, w * 3)], axis=1
    ).tobytes()
    idat = zlib.compress(raster, 6)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
    Path(path).write_bytes(png)
