"""Minimal REAL PNG codec — pure stdlib (zlib + struct), no PIL.

Closes half of the media-decoder gap honestly: PNG is the one mainstream
image format whose decompression (DEFLATE) ships in the Python stdlib,
so the engine can really decode it — no fake, no external dependency.
JPEG/video stay deterministic stubs (their codecs are not in the
container); `multimodal.decode_image_batches` tries this decoder first
and falls back to the stub for anything that does not parse.

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), non-interlaced, all five scanline filters (None/Sub/Up/
Average/Paeth — PNG spec §6). Palette and interlace raise ValueError
(the caller falls back). The encoder writes filter-0 rows (round-trip
companion; tests apply filters 1-4 by hand to pin the unfilter paths).
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels) -> bytes:
    """(h, w) or (h, w, c) uint8 array → PNG bytes (filter 0, one IDAT)."""
    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes):
    """PNG bytes → (width, height, channels, (h, w, c) uint8 ndarray).
    Raises ValueError on anything outside the supported profile."""
    import numpy as np

    if not data.startswith(_SIG):
        raise ValueError("not a PNG")
    pos = len(_SIG)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        crc = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError("bad CRC")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported profile: depth={depth} color={color_type} "
            f"interlace={interlace}"
        )
    c = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * c
    if len(raw) != h * (1 + stride):
        raise ValueError("bad IDAT length")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = raw[y * (1 + stride)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (1 + stride) + 1
        ).astype(np.int32)
        if f == 0:
            rec = line
        elif f == 1:  # Sub: add reconstructed left (sequential in x)
            rec = line.copy()
            for x in range(c, stride):
                rec[x] = (rec[x] + rec[x - c]) & 0xFF
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f == 3:  # Average
            rec = line.copy()
            for x in range(stride):
                left = rec[x - c] if x >= c else 0
                rec[x] = (rec[x] + (left + prev[x]) // 2) & 0xFF
        elif f == 4:  # Paeth
            rec = line.copy()
            for x in range(stride):
                left = rec[x - c] if x >= c else 0
                ul = prev[x - c] if x >= c else 0
                rec[x] = (rec[x] + _paeth(int(left), int(prev[x]), int(ul))) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return w, h, c, out.reshape(h, w, c)
