"""Minimal PNG codec in numpy + stdlib zlib.

The container ships no image libraries (no PIL/opencv), but PNG is a
fully public format (RFC 2083 / W3C PNG spec): signature, IHDR, zlib
DEFLATE IDAT with per-scanline filters, IEND.  This module implements
enough of it for the multimodal pipeline to do REAL decode work:

- encode: 8-bit grayscale / RGB / RGBA, filter 0 scanlines;
- decode: 8-bit gray/RGB/RGBA, non-interlaced, ALL five scanline
  filters (None/Sub/Up/Average/Paeth) so foreign encoders' output
  decodes too.

Vectorized where the format allows (filters are sequential by nature
per scanline dependency; the per-scanline inner ops are numpy).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """img: uint8 array (h, w) grayscale, (h, w, 3) RGB or (h, w, 4)
    RGBA -> PNG bytes (filter 0, one IDAT)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, channels = 0, 1
        img = img[:, :, None]
    elif img.shape[2] == 3:
        color_type, channels = 2, 3
    elif img.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported channel count {img.shape}")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.zeros((h, 1 + w * channels), dtype=np.uint8)
    raw[:, 1:] = img.reshape(h, w * channels)
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def is_png(payload: bytes) -> bool:
    return payload is not None and bytes(payload[:8]) == _SIG


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w, channels).  8-bit gray/RGB/RGBA,
    non-interlaced."""
    payload = bytes(payload)
    if not is_png(payload):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bitdepth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bitdepth != 8:
                raise ValueError(f"unsupported bit depth {bitdepth}")
            if color_type not in _COLOR_CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    channels = _COLOR_CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + width * channels
    raw = raw.reshape(height, stride)
    filters = raw[:, 0]
    data = raw[:, 1:].astype(np.int32)
    out = np.zeros_like(data)
    bpp = channels
    prev = np.zeros(width * channels, dtype=np.int32)
    for y in range(height):
        line = data[y].copy()
        f = filters[y]
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(bpp, len(line)):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif f == 2:  # Up
            line = (line + prev) & 0xFF
        elif f == 3:  # Average
            for x in range(len(line)):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(len(line)):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
        out[y] = line
        prev = line
    return out.astype(np.uint8).reshape(height, width, channels)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize via index striding (the thumbnail /
    frame-sample primitive)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]
