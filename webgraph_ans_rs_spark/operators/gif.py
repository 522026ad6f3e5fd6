"""Pure-stdlib GIF decoder (87a/89a) + a minimal test-fixture encoder.

Closes another slice of the media-decoder gap (multimodal.py): GIF is
the one ANIMATED container whose entire stack — block structure, LZW
with variable code widths, palettes, transparency, frame disposal — is
decodable with no external codec (LZW is ~60 lines of integer math; the
container is length-prefixed sub-blocks). That makes ``frame_sample`` a
REAL frame sampler for real animations, not only the deterministic
stub, with the same dispatch discipline as the PNG/WAV kernels
(operators/png.py, multimodal.decode_audio_batches).

Spec: GIF89a specification (CompuServe, 1990; public). Layout parsed:

  header "GIF87a"/"GIF89a"
  logical screen descriptor (w, h, GCT flag/size, background index)
  [global color table]
  blocks until trailer 0x3B:
    0x21 extension  (0xF9 graphic control: disposal, transparency;
                     others skipped by sub-block walking)
    0x2C image descriptor (x, y, w, h, local table, interlace)
        + LZW min code size + sub-blocked LZW pixel indices

Frames are composited onto the logical canvas with disposal semantics
1 (leave) and 2 (restore to background); 3 (restore to previous) is
treated as 1 — documented approximation, rare in web GIFs. Transparent
pixels leave the underlying canvas visible.

The encoder exists to make tests self-contained (no binary fixtures in
the repo): it emits a spec-valid LZW stream by issuing a CLEAR code
before every pixel code, so the code table never grows and the stream
stays at min_code_size+1 bits/code — bigger than a real encoder's
output but decodable by ANY conformant decoder, including this one and
the deterministic fake-free path in multimodal.frame_sample tests.
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------ LZW ------------------------------


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> bytearray:
    """GIF-flavored LZW: little-endian bit packing, CLEAR/EOI codes,
    code width grows 3..12 bits. Raises ValueError on malformed input."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"gif: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + code_size <= total_bits:
        byte_i = bitpos >> 3
        window = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (window >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if code < len(table) and code not in (clear, eoi):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"gif: LZW code {code} out of range")
        out += entry
        if len(out) > max_pixels:
            raise ValueError("gif: LZW output exceeds frame size")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    raise ValueError("gif: LZW stream ended without EOI")


def _lzw_encode_trivial(min_code_size: int, indices: bytes) -> bytes:
    """Spec-valid LZW stream with a CLEAR before every pixel code —
    the table never grows, so every code is min_code_size+1 bits."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for px in indices:
        emit(px)
        emit(clear)
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------- container ---------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif(raw: bytes, max_frames: int | None = None):
    """(width, height, frames) — frames are composited (h, w, 3) uint8
    arrays on the logical canvas. Raises ValueError on malformed input.
    ``max_frames`` stops decoding early (frame sampling never needs the
    whole animation)."""
    if len(raw) < 13 or raw[:4] != b"GIF8" or raw[4:6] not in (b"7a", b"9a"):
        raise ValueError("gif: bad header")
    w, h = struct.unpack_from("<HH", raw, 6)
    if w == 0 or h == 0:
        raise ValueError("gif: zero canvas")
    packed = raw[10]
    bg_index = raw[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(raw[pos : pos + 3 * n], dtype=np.uint8)
        if len(gct) != 3 * n:
            raise ValueError("gif: truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n

    if gct is not None and bg_index < len(gct):
        canvas = np.tile(gct[bg_index], (h, w, 1))
    else:
        canvas = np.zeros((h, w, 3), dtype=np.uint8)
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0

    def sub_blocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            if p >= len(raw):
                raise ValueError("gif: truncated sub-blocks")
            n = raw[p]
            p += 1
            if n == 0:
                return b"".join(chunks), p
            chunks.append(raw[p : p + n])
            if len(raw[p : p + n]) != n:
                raise ValueError("gif: truncated sub-block")
            p += n

    while True:
        if pos >= len(raw):
            raise ValueError("gif: missing trailer")
        b0 = raw[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            if pos >= len(raw):
                raise ValueError("gif: truncated extension")
            label = raw[pos]
            pos += 1
            data, pos = sub_blocks(pos)
            if label == 0xF9 and len(data) >= 4:
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                transparent = data[3] if flags & 0x01 else None
            continue
        if b0 != 0x2C:
            raise ValueError(f"gif: unknown block 0x{b0:02x}")
        # image descriptor
        if pos + 9 > len(raw):
            raise ValueError("gif: truncated image descriptor")
        x, y, iw, ih = struct.unpack_from("<HHHH", raw, pos)
        ipacked = raw[pos + 8]
        pos += 9
        if iw == 0 or ih == 0 or x + iw > w or y + ih > h:
            raise ValueError("gif: image block outside canvas")
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(raw[pos : pos + 3 * n], dtype=np.uint8)
            if len(table) != 3 * n:
                raise ValueError("gif: truncated local color table")
            table = table.reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("gif: no color table for image block")
        if pos >= len(raw):
            raise ValueError("gif: missing LZW code size")
        mcs = raw[pos]
        pos += 1
        data, pos = sub_blocks(pos)
        idx = _lzw_decode(mcs, data, iw * ih)
        if len(idx) < iw * ih:
            raise ValueError("gif: short frame")
        arr = np.frombuffer(bytes(idx[: iw * ih]), dtype=np.uint8).reshape(ih, iw)
        if ipacked & 0x40:
            arr = _deinterlace(arr)
        if int(arr.max()) >= len(table):
            raise ValueError("gif: pixel index outside color table")
        region = canvas[y : y + ih, x : x + iw]
        rgb = table[arr]
        if transparent is not None:
            mask = arr != transparent
            region = region.copy()
            region[mask] = rgb[mask]
        else:
            region = rgb
        # next frame composites onto this one (disposal 1/0) or onto the
        # background-restored canvas (2); 3 ≈ 1 (documented)
        frame_canvas = canvas.copy()
        frame_canvas[y : y + ih, x : x + iw] = region
        frames.append(frame_canvas)
        if disposal == 2:
            bg = (
                gct[bg_index]
                if gct is not None and bg_index < len(gct)
                else np.zeros(3, dtype=np.uint8)
            )
            canvas = frame_canvas.copy()
            canvas[y : y + ih, x : x + iw] = bg
        else:
            canvas = frame_canvas
        transparent = None
        disposal = 0
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("gif: no image blocks")
    return w, h, frames


def encode_gif(
    frames: list[np.ndarray],
    palette: list[tuple[int, int, int]],
    transparent: int | None = None,
    disposal: int = 1,
) -> bytes:
    """Minimal GIF89a writer for index-array frames (each (h, w) uint8
    into ``palette``) — the self-contained test-fixture generator; see
    module docstring for the trivial-LZW validity argument."""
    if not frames:
        raise ValueError("encode_gif: no frames")
    h, w = frames[0].shape
    n = max(2, 1 << (len(palette) - 1).bit_length())
    exp = n.bit_length() - 2  # 2 << exp == n
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (7 << 4) | exp)  # GCT present, 8-bit color res
    out += b"\x00\x00"  # bg index 0, aspect 0
    for i in range(n):
        out += bytes(palette[i] if i < len(palette) else (0, 0, 0))
    mcs = max(2, n.bit_length() - 1)
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("encode_gif: frame shape mismatch")
        out += bytes([0x21, 0xF9, 0x04])
        flags = (disposal & 0x07) << 2
        tidx = 0
        if transparent is not None:
            flags |= 1
            tidx = transparent
        out += bytes([flags, 0x00, 0x00, tidx, 0x00])
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out.append(mcs)
        stream = _lzw_encode_trivial(mcs, bytes(fr.astype(np.uint8).ravel()))
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0x00)
    out.append(0x3B)
    return bytes(out)
