"""ISO BMFF (MP4) container parser — real video-frame EXTRACTION without
a codec.

A training-data pipeline's video path splits into (a) container-level
work — locating frames, timing, resolution, codec id — and (b) pixel
decoding. (b) needs ffmpeg-class codecs that are not in this container
and stays a labeled stub (multimodal.py); (a) is pure box parsing and is
implemented here FOR REAL: walking `moov` sample tables (stsd/stts/stsc/
stsz/stco) maps every sample to its byte range in `mdat`, so
``frame_sample`` emits the md5 of each sampled frame's actual compressed
payload — exactly what a pipeline ships to a GPU decode stage — and
``mp4_meta`` reports real duration/dimensions/codec.

Spec: ISO/IEC 14496-12 (public). Boxes parsed: ftyp, moov, mvhd, trak,
tkhd, mdia, mdhd, hdlr, minf, stbl, stsd (codec fourcc + visual dims),
stts (timing), stsc (sample→chunk runs), stsz/stz2-fixed, stco/co64.
Fragmented MP4 (moof) raises — different animal, documented.

The fixture builder emits a minimal-but-conformant progressive MP4
(ftyp + mdat + full moov sample tables) so tests are self-contained.
"""

from __future__ import annotations

import struct


def _walk(raw: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", raw, pos)[0]
        fourcc = raw[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize box")
            size = struct.unpack_from(">Q", raw, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < (body - pos) or pos + size > end:
            raise ValueError("mp4: bad box size")
        yield fourcc, body, pos + size
        pos += size
    if pos != end:
        raise ValueError("mp4: trailing bytes inside container")


def _find(raw: bytes, start: int, end: int, fourcc: bytes):
    return [
        (b, e) for f, b, e in _walk(raw, start, end) if f == fourcc
    ]


def _full_box(raw: bytes, b: int) -> tuple[int, int]:
    """(version, body offset past version/flags)."""
    return raw[b], b + 4


def _parse_track(raw: bytes, b: int, e: int) -> dict | None:
    tkhd = _find(raw, b, e, b"tkhd")
    mdia = _find(raw, b, e, b"mdia")
    if not mdia:
        return None
    mb, me = mdia[0]
    hdlr = _find(raw, mb, me, b"hdlr")
    mdhd = _find(raw, mb, me, b"mdhd")
    minf = _find(raw, mb, me, b"minf")
    if not (hdlr and mdhd and minf):
        return None
    handler = raw[hdlr[0][0] + 8 : hdlr[0][0] + 12]
    v, p = _full_box(raw, mdhd[0][0])
    if v == 1:
        timescale, duration = struct.unpack_from(">IQ", raw, p + 16)
    else:
        timescale, duration = struct.unpack_from(">II", raw, p + 8)
    stbl = _find(raw, minf[0][0], minf[0][1], b"stbl")
    if not stbl:
        return None
    sb, se = stbl[0]
    track: dict = {
        "handler": handler.decode("latin1"),
        "timescale": int(timescale),
        "duration": int(duration),
        "width": None,
        "height": None,
        "codec": None,
    }
    if tkhd:
        v, p = _full_box(raw, tkhd[0][0])
        # width/height are the LAST two 16.16 fields of tkhd
        off = tkhd[0][1] - 8
        w16, h16 = struct.unpack_from(">II", raw, off)
        track["width"] = w16 >> 16
        track["height"] = h16 >> 16
    stsd = _find(raw, sb, se, b"stsd")
    if stsd:
        _, p = _full_box(raw, stsd[0][0])
        n_entries = struct.unpack_from(">I", raw, p)[0]
        if n_entries >= 1:
            track["codec"] = raw[p + 8 : p + 12].decode("latin1")
            if track["handler"] == "vide" and stsd[0][1] - (p + 4) >= 0x24:
                # visual sample entry: width/height at offset 24/26 past
                # the entry header — authoritative over tkhd's 16.16
                ew, eh = struct.unpack_from(">HH", raw, p + 4 + 8 + 24)
                if ew and eh:
                    track["width"], track["height"] = ew, eh
    # ---- sample tables → per-sample byte ranges + timestamps ----
    stsz = _find(raw, sb, se, b"stsz")
    stsc = _find(raw, sb, se, b"stsc")
    stco = _find(raw, sb, se, b"stco") or _find(raw, sb, se, b"co64")
    stts = _find(raw, sb, se, b"stts")
    if not (stsz and stsc and stco and stts):
        track["samples"] = None
        return track
    _, p = _full_box(raw, stsz[0][0])
    uniform, n_samples = struct.unpack_from(">II", raw, p)
    sizes = (
        [uniform] * n_samples
        if uniform
        else list(struct.unpack_from(f">{n_samples}I", raw, p + 8))
    )
    is64 = raw[stco[0][0] - 4 : stco[0][0]] == b"co64"
    _, p = _full_box(raw, stco[0][0])
    n_chunks = struct.unpack_from(">I", raw, p)[0]
    fmt = ">" + ("Q" if is64 else "I") * n_chunks
    offsets = list(struct.unpack_from(fmt, raw, p + 4))
    _, p = _full_box(raw, stsc[0][0])
    n_runs = struct.unpack_from(">I", raw, p)[0]
    runs = [
        struct.unpack_from(">III", raw, p + 4 + 12 * i) for i in range(n_runs)
    ]
    # expand sample→chunk mapping
    per_chunk: list[int] = []
    for i, (first, spc, _desc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        per_chunk.extend([spc] * (last - first + 1))
    if len(per_chunk) != n_chunks or sum(per_chunk) < n_samples:
        raise ValueError("mp4: inconsistent stsc/stco tables")
    ranges: list[tuple[int, int]] = []
    si = 0
    for ci, spc in enumerate(per_chunk):
        off = offsets[ci]
        for _ in range(spc):
            if si >= n_samples:
                break
            ranges.append((off, sizes[si]))
            off += sizes[si]
            si += 1
    _, p = _full_box(raw, stts[0][0])
    n_tt = struct.unpack_from(">I", raw, p)[0]
    ts: list[int] = []
    t = 0
    for i in range(n_tt):
        cnt, delta = struct.unpack_from(">II", raw, p + 4 + 8 * i)
        for _ in range(cnt):
            ts.append(t)
            t += delta
    if len(ts) < n_samples:
        raise ValueError("mp4: stts covers fewer samples than stsz")
    track["samples"] = [
        {"offset": o, "size": s, "t": ts[i]}
        for i, (o, s) in enumerate(ranges)
    ]
    return track


def parse_mp4(raw: bytes) -> dict:
    """{brand, duration_s, tracks: [{handler, codec, width, height,
    timescale, duration, samples: [{offset, size, t}] | None}]}.
    Raises ValueError on non-MP4 / fragmented / malformed input."""
    if len(raw) < 12 or raw[4:8] != b"ftyp":
        raise ValueError("mp4: missing ftyp")
    boxes = list(_walk(raw, 0, len(raw)))
    if any(f == b"moof" for f, _, _ in boxes):
        raise ValueError("mp4: fragmented (moof) unsupported")
    moov = [(b, e) for f, b, e in boxes if f == b"moov"]
    if not moov:
        raise ValueError("mp4: missing moov")
    mb, me = moov[0]
    mvhd = _find(raw, mb, me, b"mvhd")
    if not mvhd:
        raise ValueError("mp4: missing mvhd")
    v, p = _full_box(raw, mvhd[0][0])
    if v == 1:
        timescale, duration = struct.unpack_from(">IQ", raw, p + 16)
    else:
        timescale, duration = struct.unpack_from(">II", raw, p + 8)
    tracks = []
    for tb, te in _find(raw, mb, me, b"trak"):
        t = _parse_track(raw, tb, te)
        if t is not None:
            tracks.append(t)
    if not tracks:
        raise ValueError("mp4: no parsable tracks")
    return {
        "brand": raw[8:12].decode("latin1"),
        "duration_s": (duration / timescale) if timescale else 0.0,
        "tracks": tracks,
    }


def video_samples(raw: bytes) -> tuple[dict, list[bytes]]:
    """(video track meta, per-sample compressed payloads) for the first
    video track — the container-level frame extraction a pipeline does
    before GPU decode. Sample byte ranges must lie inside the file."""
    meta = parse_mp4(raw)
    vid = next((t for t in meta["tracks"] if t["handler"] == "vide"), None)
    if vid is None or vid["samples"] is None:
        raise ValueError("mp4: no video track with sample tables")
    out = []
    for s in vid["samples"]:
        if s["offset"] + s["size"] > len(raw):
            raise ValueError("mp4: sample range outside file")
        out.append(raw[s["offset"] : s["offset"] + s["size"]])
    return vid, out


# ------------------------- fixture builder -------------------------


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def build_mp4_fixture(
    frames: list[bytes],
    width: int = 64,
    height: int = 48,
    timescale: int = 1000,
    frame_delta: int = 40,
    samples_per_chunk: int = 2,
) -> bytes:
    """Minimal conformant progressive MP4: one video track whose samples
    are the given frame payloads, chunked ``samples_per_chunk`` at a
    time. The mdat precedes the moov so chunk offsets are computable in
    one pass."""
    n = len(frames)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_body = b"".join(frames)
    mdat = _box(b"mdat", mdat_body)
    base = len(ftyp) + 8  # offset of first sample payload
    # chunk offsets
    offsets = []
    off = base
    for i in range(0, n, samples_per_chunk):
        offsets.append(off)
        off += sum(len(f) for f in frames[i : i + samples_per_chunk])
    duration = n * frame_delta
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate
        + struct.pack(">H", 0x0100)  # volume
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">B3B", 0, 0, 0, 7)
        + struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 16
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _box(
        b"mdhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # 'und', pre_defined
    )
    hdlr = _box(
        b"hdlr", struct.pack(">B3x", 0) + b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"v\x00"
    )
    # visual sample entry 'avc1' with zeroed codec-private (86-byte body)
    entry = (
        struct.pack(">I", 86 + 8)
        + b"avc1"
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data ref index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">H", 0x18)
        + struct.pack(">h", -1)
    )
    stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1) + entry)
    stts = _box(
        b"stts", struct.pack(">B3xI", 0, 1) + struct.pack(">II", n, frame_delta)
    )
    stsc = _box(
        b"stsc",
        struct.pack(">B3xI", 0, 1) + struct.pack(">III", 1, samples_per_chunk, 1),
    )
    stsz = _box(
        b"stsz",
        struct.pack(">B3xII", 0, 0, n)
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _box(
        b"stco",
        struct.pack(">B3xI", 0, len(offsets))
        + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _box(b"vmhd", struct.pack(">B3B", 0, 0, 0, 1) + b"\x00" * 8)
    dref = _box(
        b"dref",
        struct.pack(">B3xI", 0, 1) + _box(b"url ", struct.pack(">B3B", 0, 0, 0, 1)),
    )
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
