"""MPEG audio (MP3) frame-header parser — real framing metadata without
a codec.

The audio analogue of the MP4 container parser (operators/mp4.py): MP3
PCM decoding needs a synthesis filterbank that is not in this container
and stays a labeled stub, but the FRAMING layer — sync words, version/
layer, bitrate and sample-rate tables, padding, frame lengths — is pure
integer math (ISO/IEC 11172-3 / 13818-3, public). Walking the frames
yields the real sample rate, channel mode, frame count, duration, and
average bitrate, which is what a corpus-curation pipeline needs from an
audio column (duration/bitrate filters) before any waveform work.

Strictness: a payload is accepted only if EVERY frame parses back-to-
back from the first sync to EOF (ID3v2 prefix and ID3v1 trailer
allowed) and there are ≥ 2 frames — random or fixture bytes cannot
satisfy a chained-frame-length walk, so the parse-or-stub dispatch
stays safe for the deterministic gate fixtures.
"""

from __future__ import annotations

# bitrate tables (kbps), index 1..14; 0 = free format (rejected), 15 bad
_BITRATES = {
    # (version_group, layer): table — version_group: 1 = MPEG1, 2 = MPEG2/2.5
    (1, 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLE_RATES = {  # by version bits (00=2.5, 10=2, 11=1)
    0b00: (11025, 12000, 8000),
    0b10: (22050, 24000, 16000),
    0b11: (44100, 48000, 32000),
}
_MODES = ("stereo", "joint_stereo", "dual_channel", "mono")


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _parse_header(h: bytes) -> dict | None:
    """4-byte frame header → {frame_len, sample_rate, samples, kbps,
    mode} or None if invalid."""
    if len(h) < 4 or h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
        return None
    version_bits = (h[1] >> 3) & 0x03
    layer_bits = (h[1] >> 1) & 0x03
    if version_bits == 0b01 or layer_bits == 0b00:
        return None  # reserved
    layer = 4 - layer_bits  # 11→1, 10→2, 01→3
    vgroup = 1 if version_bits == 0b11 else 2
    br_idx = (h[2] >> 4) & 0x0F
    sr_idx = (h[2] >> 2) & 0x03
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format or invalid
    kbps = _BITRATES[(vgroup, layer)][br_idx - 1]
    sr = _SAMPLE_RATES[version_bits][sr_idx]
    padding = (h[2] >> 1) & 1
    if layer == 1:
        frame_len = (12 * kbps * 1000 // sr + padding) * 4
        samples = 384
    else:
        per = 144 if (layer == 2 or vgroup == 1) else 72
        frame_len = per * kbps * 1000 // sr + padding
        samples = 1152 if (layer == 2 or vgroup == 1) else 576
    mode = _MODES[(h[3] >> 6) & 0x03]
    return {
        "frame_len": frame_len,
        "sample_rate": sr,
        "samples": samples,
        "kbps": kbps,
        "mode": mode,
        "layer": layer,
        "mpeg1": vgroup == 1,
    }


def parse_mp3(raw: bytes) -> dict:
    """{sample_rate, n_channels, n_frames, duration_s, avg_kbps, mode,
    layer} from a back-to-back frame walk. Raises ValueError unless the
    WHOLE payload (modulo ID3 tags) is a valid chained frame sequence of
    ≥ 2 frames."""
    pos = 0
    if raw[:3] == b"ID3":
        if len(raw) < 10:
            raise ValueError("mp3: truncated ID3v2")
        pos = 10 + _syncsafe(raw[6:10])
    end = len(raw)
    if end - pos >= 128 and raw[end - 128 : end - 125] == b"TAG":
        end -= 128  # ID3v1 trailer
    frames = 0
    total_samples = 0
    total_kbps = 0
    first = None
    while pos < end:
        h = _parse_header(raw[pos : pos + 4])
        if h is None:
            raise ValueError(f"mp3: bad frame header at {pos}")
        if first is None:
            first = h
        elif (h["sample_rate"], h["layer"]) != (
            first["sample_rate"],
            first["layer"],
        ):
            raise ValueError("mp3: inconsistent stream parameters")
        if pos + h["frame_len"] > end:
            raise ValueError("mp3: truncated final frame")
        frames += 1
        total_samples += h["samples"]
        total_kbps += h["kbps"]
        pos += h["frame_len"]
    if frames < 2:
        raise ValueError("mp3: fewer than 2 frames")
    sr = first["sample_rate"]
    return {
        "sample_rate": sr,
        "n_channels": 1 if first["mode"] == "mono" else 2,
        "n_frames": frames,
        "duration_s": round(total_samples / sr, 6),
        "avg_kbps": round(total_kbps / frames, 3),
        "mode": first["mode"],
        "layer": first["layer"],
    }


def build_mp3_fixture(
    n_frames: int = 5,
    kbps_idx: int = 9,
    sr_idx: int = 0,
    mono: bool = False,
    id3v2: bool = False,
) -> bytes:
    """Valid MPEG1 Layer III frame chain with zeroed payloads — the
    self-contained test input (a real encoder's side info is opaque to
    the FRAMING layer this module parses)."""
    out = bytearray()
    if id3v2:
        body = b"\x00" * 20
        out += b"ID3\x04\x00\x00" + bytes(
            [(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F,
             (len(body) >> 7) & 0x7F, len(body) & 0x7F]
        ) + body
    for i in range(n_frames):
        padding = i % 2  # exercise per-frame length variation
        h1 = 0xFF
        h2 = 0xE0 | (0b11 << 3) | (0b01 << 1)  # MPEG1, Layer III
        h3 = (kbps_idx << 4) | (sr_idx << 2) | (padding << 1)
        h4 = (0b11 << 6) if mono else 0
        kbps = _BITRATES[(1, 3)][kbps_idx - 1]
        sr = _SAMPLE_RATES[0b11][sr_idx]
        frame_len = 144 * kbps * 1000 // sr + padding
        out += bytes([h1, h2, h3, h4]) + b"\x00" * (frame_len - 4)
    return bytes(out)
