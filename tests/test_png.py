"""Real pure-stdlib PNG codec: round trips across color types, all five
scanline filters, corruption detection, and the decode_image_batches
real-vs-stub dispatch."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from webgraph_ans_rs_spark.operators.png import _chunk, decode_png, encode_png


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_color_types(channels):
    rng = np.random.RandomState(channels)
    a = rng.randint(0, 256, (13, 9, channels), dtype=np.uint8)
    w, h, c, px = decode_png(encode_png(a))
    assert (w, h, c) == (9, 13, channels)
    assert (px == a).all()


def _png_with_filters(a: np.ndarray, filters: list[int]) -> bytes:
    """Hand-build a PNG whose row y uses filters[y] — pins the unfilter
    paths the filter-0 encoder never emits."""
    h, w, c = a.shape
    lines = []
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        rec = a[y].reshape(-1).astype(np.int32)
        f = filters[y]
        if f == 0:
            enc = rec
        elif f == 1:
            left = np.concatenate([np.zeros(c, np.int32), rec[:-c]])
            enc = (rec - left) & 0xFF
        elif f == 2:
            enc = (rec - prev) & 0xFF
        elif f == 3:
            left = np.concatenate([np.zeros(c, np.int32), rec[:-c]])
            enc = (rec - (left + prev) // 2) & 0xFF
        elif f == 4:
            enc = np.empty_like(rec)
            for x in range(len(rec)):
                pa = int(rec[x - c]) if x >= c else 0
                pb = int(prev[x])
                pc = int(prev[x - c]) if x >= c else 0
                p = pa + pb - pc
                da, db, dc = abs(p - pa), abs(p - pb), abs(p - pc)
                pred = pa if (da <= db and da <= dc) else (pb if db <= dc else pc)
                enc[x] = (rec[x] - pred) & 0xFF
        lines.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = rec
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )


def test_png_all_filter_types_unfilter():
    rng = np.random.RandomState(7)
    a = rng.randint(0, 256, (10, 6, 3), dtype=np.uint8)
    data = _png_with_filters(a, [0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    w, h, c, px = decode_png(data)
    assert (px == a).all()


def test_png_rejects_corruption_and_nonsense():
    a = np.zeros((4, 4, 3), dtype=np.uint8)
    good = encode_png(a)
    bad = bytearray(good)
    bad[40] ^= 0xFF  # flip a byte inside a chunk -> CRC mismatch
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"garbage-not-chunks")
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_decode_image_batches_real_vs_stub(spark):
    """A genuine PNG gets its REAL dimensions; a fake payload that only
    carries the PNG magic falls back to the stub byte-for-byte (the
    driver-gate fixture shape, so the oracle stays valid)."""
    from webgraph_ans_rs_spark.operators.multimodal import (
        _fake_decode,
        decode_image_batches,
    )

    rng = np.random.RandomState(3)
    real = encode_png(rng.randint(0, 256, (21, 34, 3), dtype=np.uint8))
    fake = b"\x89PNG" + b"\x13\x37" * 20
    df = spark.createDataFrame(
        [(1, bytearray(real)), (2, bytearray(fake))], "key long, payload binary"
    )
    got = {r.key: r for r in decode_image_batches(df).collect()}
    assert (got[1].width, got[1].height, got[1].n_channels) == (34, 21, 3)
    assert got[1].kind == "png"
    fw, fh, fc, ff = _fake_decode(fake)
    assert (got[2].width, got[2].height, got[2].n_channels) == (fw, fh, fc)
    assert [round(x, 6) for x in got[2].features] == ff


def test_decode_audio_real_wav_vs_stub(spark):
    """A genuine PCM WAV (stdlib wave writer) decodes for real — exact
    sample rate/channels/frames and an analytically-known RMS; a RIFF
    payload that isn't a WAV falls back to the deterministic stub."""
    import io
    import wave

    from webgraph_ans_rs_spark.operators.multimodal import (
        _fake_audio,
        decode_audio_batches,
    )

    # 1 second of a full-scale square wave at 8 kHz mono -> RMS = 1.0
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        sq = np.tile(np.array([-32768, -32768, 32767, 32767], dtype="<i2"), 2000)
        wf.writeframes(sq.tobytes())
    real = buf.getvalue()
    fake = b"RIFF" + b"\x42" * 32
    df = spark.createDataFrame(
        [(1, bytearray(real)), (2, bytearray(fake))], "key long, payload binary"
    )
    got = {r.key: r for r in decode_audio_batches(df).collect()}
    assert got[1].kind == "wav"
    assert (got[1].sample_rate, got[1].n_channels, got[1].n_frames) == (8000, 1, 8000)
    assert got[1].duration_s == 1.0
    assert abs(got[1].rms - 1.0) < 1e-4
    sr, ch, fr, dur, rms = _fake_audio(fake)
    assert (got[2].sample_rate, got[2].n_channels, got[2].n_frames) == (sr, ch, fr)
    assert got[2].kind == "riff"
