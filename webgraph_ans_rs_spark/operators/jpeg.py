"""Pure-Python/numpy baseline JPEG decoder + a minimal fixture encoder.

Closes the JPEG slice of the media-decoder gap (multimodal.py): baseline
sequential DCT JPEG (ITU-T T.81 — the public spec; SOF0, one scan) needs
no external codec: Huffman coding, zigzag run-lengths, dequantization,
the 8×8 inverse DCT, and YCbCr→RGB are all integer/matrix math. This is
the overwhelmingly dominant web-JPEG profile; progressive (SOF2),
arithmetic-coded, and hierarchical files raise ValueError and fall back
to the deterministic stub upstream — the same honest dispatch as the
PNG/GIF/WAV kernels.

Supported: 8-bit baseline, 1 or 3 components, chroma sampling factors
1–2 in each axis (4:4:4, 4:2:2, 4:2:0), restart intervals, multiple
DQT/DHT segments, byte stuffing. IDCT is the orthonormal 8-point DCT-II
matrix pair (T.T @ coef @ T), vectorized over all blocks of a component
at once.

The encoder exists to make tests self-contained (no binary fixtures):
4:4:4 / quality-1 quantization (all-ones tables — the only loss is DCT
float rounding, so round-trips assert tight pixel error) and trivially
valid canonical Huffman tables (every DC symbol 4 bits, every AC symbol
9 bits — legal DHT payloads that no real encoder would emit but every
conformant decoder must accept).
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_K = np.arange(8)
_DCT_T = np.where(_K[:, None] == 0, np.sqrt(1 / 8), 0.5) * np.cos(
    (2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16
)


def _idct2(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) coefficient blocks → spatial samples (orthonormal)."""
    return np.einsum("ij,njk,kl->nil", _DCT_T.T, blocks, _DCT_T)


def _fdct2(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ij,njk,kl->nil", _DCT_T, blocks, _DCT_T.T)


# --------------------------- Huffman ---------------------------


def _build_decode_table(counts: list[int], symbols: bytes) -> dict:
    """(length, code) → symbol from the DHT canonical description."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    if k != len(symbols):
        raise ValueError("jpeg: DHT symbol count mismatch")
    return table


class _BitReader:
    """MSB-first reader over the entropy-coded segment; un-stuffs 0xFF00
    and stops at markers (restart handling is the caller's job)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        p = self.pos
        if p >= len(d):
            raise ValueError("jpeg: entropy segment truncated")
        b = d[p]
        if b == 0xFF:
            if p + 1 < len(d) and d[p + 1] == 0x00:
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                self.pos = p + 2
                return
            raise ValueError("jpeg: marker inside entropy segment")
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        self.pos = p + 1

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")

    def align_to_marker(self) -> int:
        """Byte-align and consume one expected restart marker, returning
        its low nibble."""
        self.acc = 0
        self.nbits = 0
        d, p = self.data, self.pos
        if p + 1 >= len(d) or d[p] != 0xFF or not (0xD0 <= d[p + 1] <= 0xD7):
            raise ValueError("jpeg: expected restart marker")
        self.pos = p + 2
        return d[p + 1] & 0x0F


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --------------------------- decoder ---------------------------


def decode_jpeg(raw: bytes):
    """(width, height, pixels) — pixels (h, w, 3) uint8 RGB (grayscale
    replicated). Baseline sequential only; raises ValueError otherwise."""
    if len(raw) < 4 or raw[0:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while True:
        if pos + 4 > len(raw):
            raise ValueError("jpeg: truncated before SOS")
        if raw[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = raw[pos + 1]
        pos += 2
        if marker == 0xD8:  # stray SOI
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(raw):
            raise ValueError("jpeg: truncated segment length")
        seglen = struct.unpack_from(">H", raw, pos)[0]
        if seglen < 2 or pos + seglen > len(raw):
            raise ValueError("jpeg: bad segment length")
        body = raw[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                b += 1
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                if b + 64 > len(body):
                    raise ValueError("jpeg: truncated DQT")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(body[b : b + 64], dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                b += 64
        elif marker == 0xC4:  # DHT
            b = 0
            while b + 17 <= len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                counts = list(body[b + 1 : b + 17])
                n = sum(counts)
                symbols = body[b + 17 : b + 17 + n]
                if len(symbols) != n:
                    raise ValueError("jpeg: truncated DHT")
                tbl = _build_decode_table(counts, symbols)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                b += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision")
            if nc not in (1, 3):
                raise ValueError(f"jpeg: {nc} components unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: only baseline SOF0 supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i : 3 + 2 * i]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:
                    raise ValueError("jpeg: scan references unknown component")
                scan.append((comp, tt >> 4, tt & 0x0F))
            if len(scan) != len(frame["comps"]):
                raise ValueError("jpeg: partial scans unsupported")
            return _decode_scan(
                raw, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval
            )
        elif marker == 0xD9:
            raise ValueError("jpeg: EOI before SOS")
        # APPn/COM/other length-prefixed segments: skipped


def _decode_scan(raw, pos, frame, scan, qt, huff_dc, huff_ac, restart):
    w, h = frame["w"], frame["h"]
    if w == 0 or h == 0:
        raise ValueError("jpeg: zero dimensions")
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        raise ValueError("jpeg: sampling factors beyond 2 unsupported")
    for c in frame["comps"]:
        if c["h"] not in (1, 2) or c["v"] not in (1, 2):
            raise ValueError("jpeg: bad sampling factor")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    r = _BitReader(raw, pos)
    # per component: coefficient blocks in MCU-raster order
    blocks = {c["id"]: [] for c in frame["comps"]}
    pred = {c["id"]: 0 for c in frame["comps"]}
    n_mcu = mcux * mcuy
    next_rst = 0
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            got = r.align_to_marker()
            if got != next_rst:
                raise ValueError("jpeg: restart marker out of sequence")
            next_rst = (next_rst + 1) & 7
            pred = {c["id"]: 0 for c in frame["comps"]}
        for comp, tdc, tac in scan:
            dct = huff_dc.get(tdc)
            act = huff_ac.get(tac)
            if dct is None or act is None:
                raise ValueError("jpeg: missing Huffman table")
            for _ in range(comp["h"] * comp["v"]):
                coef = np.zeros(64, dtype=np.int32)
                t = r.read_symbol(dct)
                if t > 11:
                    raise ValueError("jpeg: bad DC category")
                diff = _extend(r.read_bits(t), t)
                pred[comp["id"]] += diff
                coef[0] = pred[comp["id"]]
                k = 1
                while k < 64:
                    rs = r.read_symbol(act)
                    rrrr, ssss = rs >> 4, rs & 0x0F
                    if ssss == 0:
                        if rrrr == 0:  # EOB
                            break
                        if rrrr == 15:  # ZRL
                            k += 16
                            continue
                        raise ValueError("jpeg: bad AC run")
                    k += rrrr
                    if k > 63:
                        raise ValueError("jpeg: AC index overflow")
                    coef[k] = _extend(r.read_bits(ssss), ssss)
                    k += 1
                blocks[comp["id"]].append(coef)
    planes = {}
    for comp in frame["comps"]:
        q = qt.get(comp["tq"])
        if q is None:
            raise ValueError("jpeg: missing quant table")
        n = len(blocks[comp["id"]])
        zz = np.stack(blocks[comp["id"]]) if n else np.zeros((0, 64), np.int32)
        deq = np.zeros((n, 64), dtype=np.float64)
        deq[:, ZIGZAG] = zz * q.reshape(-1)[ZIGZAG]
        spatial = _idct2(deq.reshape(n, 8, 8)) + 128.0
        # reassemble MCU-raster blocks into the component plane
        bw = comp["h"] * mcux  # blocks per row
        bh = comp["v"] * mcuy
        plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        i = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        plane[y0 : y0 + 8, x0 : x0 + 8] = spatial[i]
                        i += 1
        # upsample to full resolution and crop
        plane = np.repeat(
            np.repeat(plane, vmax // comp["v"], axis=0), hmax // comp["h"], axis=1
        )
        planes[comp["id"]] = plane[:h, :w]
    comps = frame["comps"]
    if len(comps) == 1:
        g = np.clip(np.round(planes[comps[0]["id"]]), 0, 255).astype(np.uint8)
        return w, h, np.stack([g, g, g], axis=-1)
    y, cb, cr = (planes[c["id"]] for c in comps)
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return w, h, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------- encoder ---------------------------

_DC_COUNTS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMBOLS = bytes(range(12))
_AC_SYMBOLS = bytes(
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_COUNTS = [0] * 16
_AC_COUNTS[8] = len(_AC_SYMBOLS)  # every AC symbol 9 bits (162 ≤ 256)


def _encode_table(counts: list[int], symbols: bytes) -> dict[int, tuple[int, int]]:
    code = 0
    k = 0
    out = {}
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (length, code)
            k += 1
            code += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _category(v: int) -> tuple[int, int]:
    t = abs(v).bit_length()
    bits = v if v >= 0 else v + (1 << t) - 1
    return t, bits


def _pad_plane(p: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate pad to (bh*8, bw*8) — avoids ringing at the crop."""
    h, w = p.shape
    pp = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    pp[:h, :w] = p
    if h < bh * 8:
        pp[h:, :w] = p[-1:, :]
    if w < bw * 8:
        pp[:, w:] = pp[:, w - 1 : w]
    return pp


def _encode_block(wr, block, pred, ci, dc_t, ac_t) -> None:
    coef = np.round(_fdct2(block[None])[0]).astype(np.int64)
    zz = coef.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    t, bits = _category(diff)
    length, code = dc_t[t]
    wr.write(code, length)
    if t:
        wr.write(bits, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_t[0xF0]
            wr.write(code, length)
            run -= 16
        t, bits = _category(v)
        if t > 10:
            raise ValueError("encode_jpeg: coefficient too large")
        length, code = ac_t[(run << 4) | t]
        wr.write(code, length)
        wr.write(bits, t)
        run = 0
    if run:
        length, code = ac_t[0x00]
        wr.write(code, length)


def encode_jpeg(
    pixels: np.ndarray,
    sampling: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline JPEG writer: (h, w, 3) uint8 RGB with all-ones
    quantization (near-lossless: the only loss is DCT rounding and, for
    ``sampling=(2,2)``, the 2×2 chroma average), fixed-width canonical
    Huffman tables, optional restart markers. Test-fixture generator —
    see module docstring. ``sampling`` is the luma (h, v) factor pair:
    (1,1) = 4:4:4, (2,2) = 4:2:0, (2,1) = 4:2:2."""
    sh, sv = sampling
    if sh not in (1, 2) or sv not in (1, 2):
        raise ValueError("encode_jpeg: sampling factors must be 1 or 2")
    h, w = pixels.shape[:2]
    rgb = pixels.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
    cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
    dc_t = _encode_table(_DC_COUNTS, _DC_SYMBOLS)
    ac_t = _encode_table(_AC_COUNTS, _AC_SYMBOLS)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + b"\x01" * 64
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * 3, 8, h, w, 3)
    out += bytes([1, (sh << 4) | sv, 0])  # Y at full sampling
    out += bytes([2, 0x11, 0])
    out += bytes([3, 0x11, 0])
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(_DC_SYMBOLS))
    out += b"\x00" + bytes(_DC_COUNTS) + _DC_SYMBOLS
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(_AC_SYMBOLS))
    out += b"\x10" + bytes(_AC_COUNTS) + _AC_SYMBOLS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * 3, 3)
    for cid in (1, 2, 3):
        out += bytes([cid, 0x00])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0
    mcux = -(-w // (8 * sh))
    mcuy = -(-h // (8 * sv))
    # chroma at 1/sh × 1/sv resolution via box average on an edge-padded
    # grid (so odd dims subsample cleanly)
    ch, cw = mcuy * 8, mcux * 8
    ypad = _pad_plane(y, mcuy * sv, mcux * sh)
    chroma = []
    for p in (cb, cr):
        pp = _pad_plane(p, mcuy * sv, mcux * sh)
        sub = pp.reshape(ch, sv, cw, sh).mean(axis=(1, 3)) if (sh, sv) != (
            1,
            1,
        ) else pp
        chroma.append(sub)
    wr = _BitWriter()
    pred = [0, 0, 0]
    next_rst = 0
    n_done = 0
    for myy in range(mcuy):
        for mxx in range(mcux):
            if restart_interval and n_done and n_done % restart_interval == 0:
                out += wr.flush()
                wr = _BitWriter()
                out += bytes([0xFF, 0xD0 + next_rst])
                next_rst = (next_rst + 1) & 7
                pred = [0, 0, 0]
            for by in range(sv):
                for bx in range(sh):
                    y0 = (myy * sv + by) * 8
                    x0 = (mxx * sh + bx) * 8
                    _encode_block(
                        wr, ypad[y0 : y0 + 8, x0 : x0 + 8] - 128.0, pred, 0,
                        dc_t, ac_t,
                    )
            for ci, plane in enumerate(chroma, start=1):
                _encode_block(
                    wr,
                    plane[myy * 8 : myy * 8 + 8, mxx * 8 : mxx * 8 + 8] - 128.0,
                    pred, ci, dc_t, ac_t,
                )
            n_done += 1
    out += wr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_444(pixels: np.ndarray) -> bytes:
    """4:4:4 shorthand (the tightest round-trip: no chroma averaging)."""
    return encode_jpeg(pixels, sampling=(1, 1))


def encode_jpeg_gray(pixels: np.ndarray) -> bytes:
    """Single-component (grayscale) baseline writer — exercises the
    decoder's 1-component path. ``pixels`` is (h, w) uint8."""
    h, w = pixels.shape
    dc_t = _encode_table(_DC_COUNTS, _DC_SYMBOLS)
    ac_t = _encode_table(_AC_COUNTS, _AC_SYMBOLS)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + b"\x01" * 64
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3, 8, h, w, 1)
    out += bytes([1, 0x11, 0])
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(_DC_SYMBOLS))
    out += b"\x00" + bytes(_DC_COUNTS) + _DC_SYMBOLS
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(_AC_SYMBOLS))
    out += b"\x10" + bytes(_AC_COUNTS) + _AC_SYMBOLS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2, 1) + bytes([1, 0x00])
    out += b"\x00\x3f\x00"
    by, bx = -(-h // 8), -(-w // 8)
    plane = _pad_plane(pixels.astype(np.float64), by, bx)
    wr = _BitWriter()
    pred = [0]
    for myy in range(by):
        for mxx in range(bx):
            _encode_block(
                wr,
                plane[myy * 8 : myy * 8 + 8, mxx * 8 : mxx * 8 + 8] - 128.0,
                pred, 0, dc_t, ac_t,
            )
    out += wr.flush()
    out += b"\xff\xd9"
    return bytes(out)
