"""Baseline JPEG codec (operators/jpeg.py) + its multimodal wiring:
round trips across sampling modes, restart markers, grayscale, strict
rejection of non-baseline streams, and the real-decode dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from webgraph_ans_rs_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_444,
    encode_jpeg_gray,
)


def _test_image(h=37, w=29, seed=3):
    rng = np.random.RandomState(seed)
    img = np.zeros((h, w, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    img[..., 0] = (xx * 255 // (w - 1)).astype(np.uint8)
    img[..., 1] = (yy * 255 // (h - 1)).astype(np.uint8)
    img[..., 2] = ((xx + yy) * 255 // (w + h - 2)).astype(np.uint8)
    img[5:9, 5:9] = rng.randint(0, 256, (4, 4, 3), dtype=np.uint8)
    return img


def test_roundtrip_444_near_lossless():
    """All-ones quantization at 4:4:4 — the only loss is DCT/YCbCr float
    rounding, so every pixel lands within ±2."""
    img = _test_image()
    w, h, px = decode_jpeg(encode_jpeg_444(img))
    assert (w, h) == (29, 37) and px.shape == (37, 29, 3)
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 2


@pytest.mark.parametrize("sampling", [(2, 2), (2, 1), (1, 2)])
def test_roundtrip_subsampled(sampling):
    """4:2:0 / 4:2:2 / 4:4:0 MCU interleaving: luma within ±2 everywhere
    (it is never subsampled); full RGB within the chroma-average bound
    on the smooth regions."""
    img = _test_image()
    w, h, px = decode_jpeg(encode_jpeg(img, sampling=sampling))
    assert (w, h) == (29, 37)
    smooth = np.ones(img.shape[:2], dtype=bool)
    smooth[4:11, 4:11] = False  # the random patch: chroma averages differ,
    # and uint8 clipping there breaks the exact Y-recombination cancellation
    y = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    y2 = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    assert np.abs(y2 - y)[smooth].max() <= 3.0
    diff = np.abs(px.astype(int) - img.astype(int))[smooth]
    assert diff.max() <= 8


def test_restart_markers_reset_predictors():
    img = _test_image()
    base = decode_jpeg(encode_jpeg(img, sampling=(2, 2)))[2]
    rst = decode_jpeg(encode_jpeg(img, sampling=(2, 2), restart_interval=1))[2]
    assert (base == rst).all()  # same pixels, different segmentation


def test_grayscale_roundtrip():
    g = (np.outer(np.arange(24), np.ones(17)) * 10 % 256).astype(np.uint8)
    w, h, px = decode_jpeg(encode_jpeg_gray(g))
    assert (w, h) == (17, 24)
    assert (px[..., 0] == px[..., 1]).all() and (px[..., 1] == px[..., 2]).all()
    assert np.abs(px[..., 0].astype(int) - g.astype(int)).max() <= 2


def test_rejects_non_baseline_and_garbage():
    img = _test_image(16, 16)
    raw = encode_jpeg_444(img)
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff" + bytes(range(64)))  # fixture-like bytes
    with pytest.raises(ValueError):
        decode_jpeg(raw[:60])  # truncated
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(raw.replace(b"\xff\xc0", b"\xff\xc2", 1))  # progressive


def test_decode_image_real_jpeg(spark):
    from webgraph_ans_rs_spark.operators.multimodal import decode_image_batches

    img = _test_image(16, 24)
    raw = encode_jpeg_444(img)
    df = spark.createDataFrame([(9, bytearray(raw))], "key long, payload binary")
    row = decode_image_batches(df).collect()[0]
    assert (row.kind, row.width, row.height, row.n_channels) == ("jpeg", 24, 16, 3)
    _, _, px = decode_jpeg(raw)
    a = px.astype("float64") / 255.0
    assert row.features[0] == pytest.approx(round(float(a[:, :, 0].mean()), 6))
    # magic-only fixture bytes keep the deterministic stub
    import hashlib

    from webgraph_ans_rs_spark.operators.multimodal import _fake_decode

    fixture = b"\xff\xd8\xff" + hashlib.md5(b"x").digest()
    df2 = spark.createDataFrame([(1, bytearray(fixture))], "key long, payload binary")
    row2 = decode_image_batches(df2).collect()[0]
    assert (row2.width, row2.height) == _fake_decode(fixture)[:2]
