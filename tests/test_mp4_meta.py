"""MP4/ISO-BMFF metadata layer (media_codec.encode_mp4/parse_mp4_meta):
round-trip across the parameter space, unknown-box tolerance (the
format's design point), and the malformed-size error paths.
"""

from __future__ import annotations

import struct

import pytest

from go_pulsar_elasticsearch_spark.llm.media_codec import (
    MediaFormatError,
    encode_mp4,
    parse_mp4_meta,
)


def test_roundtrip_parameter_sweep():
    for d in range(0, 50, 7):
        w, h = 160 + 16 * (d % 20), 90 + 9 * (d % 15)
        dur = 1000 + 37 * d
        n = 1 + d % 3
        m = parse_mp4_meta(
            encode_mp4(w, h, dur, n_tracks=n, payload=b"p" * (d % 64))
        )
        assert (m["width"], m["height"]) == (w, h)
        assert m["n_tracks"] == n
        assert m["mdat_bytes"] == d % 64
        # ms -> timescale units -> ms floors deterministically
        assert m["duration_ms"] == (dur * 600 // 1000) * 1000 // 600
        assert m["brand"] == "isom"


def test_unknown_boxes_are_skipped_by_size():
    data = encode_mp4(64, 48, 500)
    free = struct.pack(">I", 16) + b"free" + b"\x00" * 8
    # inject an unknown top-level box between ftyp and moov
    ftyp_size = struct.unpack(">I", data[:4])[0]
    patched = data[:ftyp_size] + free + data[ftyp_size:]
    m = parse_mp4_meta(patched)
    assert (m["width"], m["height"]) == (64, 48)


def test_rejects_box_size_overrun():
    data = bytearray(encode_mp4(64, 48, 500))
    data[0:4] = struct.pack(">I", len(data) + 100)  # ftyp claims too much
    with pytest.raises(MediaFormatError):
        parse_mp4_meta(bytes(data))


def test_rejects_undersized_box():
    data = bytearray(encode_mp4(64, 48, 500))
    data[0:4] = struct.pack(">I", 4)  # below the 8-byte header minimum
    with pytest.raises(MediaFormatError):
        parse_mp4_meta(bytes(data))


def test_rejects_missing_moov():
    data = encode_mp4(64, 48, 500)
    ftyp_size = struct.unpack(">I", data[:4])[0]
    with pytest.raises(MediaFormatError):
        parse_mp4_meta(data[:ftyp_size])  # ftyp alone

    with pytest.raises(MediaFormatError):
        parse_mp4_meta(b"\x00\x00\x00\x18ftypmp42")  # truncated header
