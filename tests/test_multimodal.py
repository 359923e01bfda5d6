"""Multimodal column plumbing: binary payloads, typed metadata, real
codec-backed feature extraction (SURVEY.md §2B multimodal_columns)."""

from __future__ import annotations

import pytest

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.llm.multimodal import (
    decode_payload,
    multimodal_features,
    with_payload,
)


def test_payload_schema(spark, sf_dir):
    m = with_payload(t(spark, sf_dir, "documents"))
    kinds = dict(m.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["media_meta"].startswith("struct<mime:string,byte_len:bigint")


def test_every_fixture_mime_routes_to_a_real_parser():
    # PNG/GIF/JPEG decode and MP4 container metadata parse for real
    # since round 8: truncated streams are FORMAT errors, not
    # missing-codec errors; only a genuinely unknown mime still raises
    # NotImplementedError (frame decode of compressed video stays out
    # of scope, and that boundary is documented at the decode gate)
    from go_pulsar_elasticsearch_spark.llm.media_codec import (
        MediaFormatError,
        encode_mp4,
    )

    with pytest.raises(MediaFormatError):
        decode_payload(b"\xff\xd8\xff\xe0", "image/jpeg")
    with pytest.raises(MediaFormatError):
        decode_payload(b"\x00\x00\x00\x18ftypmp42", "video/mp4")
    meta = decode_payload(
        encode_mp4(320, 180, 2500, payload=b"zz"), "video/mp4"
    )
    assert (meta["width"], meta["height"]) == (320, 180)
    assert meta["duration_ms"] == 2500 and meta["mdat_bytes"] == 2
    with pytest.raises(NotImplementedError):
        decode_payload(b"....", "application/x-unknown")


def test_features_match_independent_recomputation(spark, sf_dir):
    """Gradient / energy / zero-crossing features recomputed in plain
    Python from the generating arithmetic must match the operator's
    codec round-trip values."""
    feats = {
        r["doc_id"]: r for r in multimodal_features(spark, sf_dir).collect()
    }
    ids = [r.doc_id for r in t(spark, sf_dir, "documents").select("doc_id").collect()]
    assert set(feats) == set(ids)
    for d in sorted(ids)[:40]:
        got = feats[d]
        if d % 2 == 0:
            w, h = 4 + d % 13, 3 + d % 7
            r = [[(d * 7 + x + 3 * y) % 256 for x in range(w)] for y in range(h)]
            grad = sum(
                abs(r[y][x + 1] - r[y][x])
                for y in range(h)
                for x in range(w - 1)
            )
            energy = sum(v * v for row in r for v in row)
            assert (got.kind, got.n_units) == ("bmp", w * h)
            assert got.grad_sum == grad
            assert got.energy_sum == energy
            assert got.aspect_milli == w * 1000 // h
        else:
            n = 50 + d % 100
            s = [(d * 31 + i * 17) % 4096 - 2048 for i in range(n)]
            zc = sum((s[i] < 0) != (s[i + 1] < 0) for i in range(n - 1))
            energy = sum(v * v for v in s)
            assert (got.kind, got.n_units) == ("wav", n)
            assert got.grad_sum == zc
            assert got.energy_sum == energy
            assert got.aspect_milli is None


def test_frame_sampling_bytes(spark, sf_dir):
    """Sampled frames carry the exact payload slices at the right
    offsets (frame k covers bytes [k*256, (k+1)*256))."""
    from go_pulsar_elasticsearch_spark.llm.multimodal import sample_frames

    docs = t(spark, sf_dir, "documents").orderBy("doc_id").limit(5)
    frames = sample_frames(with_payload(docs), frame_size=256, stride=2)
    got = {}
    for r in frames.collect():
        got.setdefault(r["doc_id"], {})[r["frame_idx"]] = bytes(r["frame"])
    for row in docs.collect():
        payload = row["text"].encode("utf-8")
        expect = {
            k: payload[k * 256:(k + 1) * 256]
            for k in range(0, (len(payload) + 255) // 256, 2)
        }
        assert got[row["doc_id"]] == expect


# --------------------------------------------------------------------------
# media_codec golden fixtures: pin the BMP/WAV byte layouts to the spec so
# an encoder/decoder bug pair cannot cancel out in the round-trip query
# --------------------------------------------------------------------------

import struct

from go_pulsar_elasticsearch_spark.llm.media_codec import (
    MediaFormatError,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)


def test_bmp_golden_bytes_2x2():
    """Hand-assembled expected bytes: 2x2, 24-bit, rows bottom-up, BGR,
    stride 2*3=6 -> padded to 8 with two zero bytes per row."""
    grid = [[(255, 0, 0), (0, 255, 0)],   # top row:    red, green
            [(0, 0, 255), (10, 20, 30)]]  # bottom row: blue, rgb(10,20,30)
    data = encode_bmp(2, 2, grid)
    assert data[:2] == b"BM"
    assert struct.unpack_from("<I", data, 2)[0] == len(data) == 54 + 16
    assert struct.unpack_from("<I", data, 10)[0] == 54          # pixel offset
    assert struct.unpack_from("<ii", data, 18) == (2, 2)        # w, h
    assert struct.unpack_from("<H", data, 28)[0] == 24          # bpp
    # bottom row first: blue=(0,0,255)->BGR ff 00 00; (10,20,30)->1e 14 0a
    assert data[54:62] == bytes([255, 0, 0, 30, 20, 10, 0, 0])
    # then top row: red -> 00 00 ff ; green -> 00 ff 00
    assert data[62:70] == bytes([0, 0, 255, 0, 255, 0, 0, 0])
    parsed = decode_bmp(data)
    assert parsed == {
        "width": 2, "height": 2, "n_pixels": 4,
        "sum_r": 265, "sum_g": 275, "sum_b": 285, "top_down": False,
    }


def test_bmp_row_padding_and_topdown():
    # width 3 -> raw stride 9, padded stride 12: padding must be skipped
    grid = [[(1, 2, 3)] * 3, [(4, 5, 6)] * 3]
    parsed = decode_bmp(encode_bmp(3, 2, grid))
    assert (parsed["sum_r"], parsed["sum_g"], parsed["sum_b"]) == (15, 21, 27)
    # top-down variant: negative height, rows in natural order
    data = bytearray(encode_bmp(3, 2, grid))
    struct.pack_into("<i", data, 22, -2)
    rows = data[54:]
    parsed2 = decode_bmp(bytes(data[:54]) + bytes(rows))
    assert parsed2["top_down"] is True
    assert parsed2["sum_r"] == 15 and parsed2["n_pixels"] == 6


def test_bmp_rejects_garbage_and_truncation():
    with pytest.raises(MediaFormatError, match="magic"):
        decode_bmp(b"PNG....")
    ok = encode_bmp(2, 2, [[(0, 0, 0)] * 2] * 2)
    with pytest.raises(MediaFormatError, match="truncated"):
        decode_bmp(ok[:-3])


def test_wav_golden_bytes_and_chunk_walk():
    samples = [0, 1000, -1000, 32767, -32768]
    data = encode_wav(8000, samples)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert data[12:16] == b"fmt " and struct.unpack_from("<I", data, 16)[0] == 16
    fmt_code, n_ch, rate = struct.unpack_from("<HHI", data, 20)
    assert (fmt_code, n_ch, rate) == (1, 1, 8000)
    assert data[36:40] == b"data"
    assert struct.unpack_from("<h", data, 46)[0] == 1000  # sample[1], LE int16
    parsed = decode_wav(data)
    assert parsed == {
        "n_channels": 1, "sample_rate": 8000, "bits_per_sample": 16,
        "n_samples": 5, "sum_abs": 0 + 1000 + 1000 + 32767 + 32768,
        "peak_abs": 32768,
    }
    # insert an odd-sized LIST chunk between fmt and data: the walker
    # must skip it (word-aligned) and still find the data chunk
    lst = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"
    spliced = data[:36] + lst + data[36:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert decode_wav(spliced) == parsed


def test_wav_rejects_non_pcm_and_garbage():
    with pytest.raises(MediaFormatError, match="RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)
    data = bytearray(encode_wav(8000, [1, 2, 3]))
    struct.pack_into("<H", data, 20, 3)  # audioFormat = IEEE float
    with pytest.raises(MediaFormatError, match="PCM"):
        decode_wav(bytes(data))


def test_decode_payload_routes_real_codecs():
    from go_pulsar_elasticsearch_spark.llm.multimodal import decode_payload

    from go_pulsar_elasticsearch_spark.llm.media_codec import (
        MediaFormatError,
        encode_png,
    )

    bmp = encode_bmp(2, 1, [[(9, 9, 9), (1, 1, 1)]])
    assert decode_payload(bmp, "image/bmp")["sum_r"] == 10
    wav = encode_wav(16000, [5, -5])
    assert decode_payload(wav, "audio/wav")["sum_abs"] == 10
    png = encode_png(2, 1, [[(9, 9, 9), (1, 1, 1)]])
    assert decode_payload(png, "image/png")["sum_r"] == 10
    # a truncated PNG is a format error now, not a missing codec
    with pytest.raises(MediaFormatError):
        decode_payload(b"\x89PNG", "image/png")


def test_bmp_pixel_decoder_roundtrips_grid():
    from go_pulsar_elasticsearch_spark.llm.media_codec import (
        decode_bmp_pixels,
        encode_bmp,
    )

    grid = [[(x * 10 % 256, y * 20 % 256, (x + y) % 256) for x in range(5)]
            for y in range(3)]
    parsed = decode_bmp_pixels(encode_bmp(5, 3, grid))
    assert parsed["width"] == 5 and parsed["height"] == 3
    assert parsed["rgb_rows"] == grid  # top-row-first, bottom-up undone


def test_ahash_recovers_constructed_near_dups(spark, sf_dir):
    """Each (2g, 2g+1) pair shares a base image with a +1 red nudge —
    the vast majority must land within the radius, every emitted pair
    must respect it, and accidental (non-constructed) pairs must be
    rare (diverse images hash apart)."""
    from pyspark.sql import functions as F

    from go_pulsar_elasticsearch_spark.catalog import t
    from go_pulsar_elasticsearch_spark.llm.multimodal import (
        _AHASH_RADIUS,
        image_ahash_neardup,
    )

    out = image_ahash_neardup(spark, sf_dir).collect()
    assert all(0 <= r["hamming"] <= _AHASH_RADIUS for r in out)
    n_docs = t(spark, sf_dir, "documents").count()
    constructed = {
        (2 * g, 2 * g + 1)
        for g in range(n_docs // 2)
    }
    got = {(r["doc_a"], r["doc_b"]) for r in out}
    recovered = len(got & constructed) / len(constructed)
    assert recovered > 0.9, recovered
    accidental = len(got - constructed)
    assert accidental < 0.05 * len(constructed), accidental


def test_wav_sample_decoder_roundtrips():
    from go_pulsar_elasticsearch_spark.llm.media_codec import (
        decode_wav_samples,
        encode_wav,
    )

    samples = [0, 100, -100, 32767, -32768, 7]
    parsed = decode_wav_samples(encode_wav(16000, samples))
    assert parsed["samples"] == samples
    assert parsed["sample_rate"] == 16000
    assert parsed["n_channels"] == 1


def test_audio_fingerprint_recovers_constructed_near_dups(spark, sf_dir):
    from pyspark.sql import functions as F

    from go_pulsar_elasticsearch_spark.catalog import t
    from go_pulsar_elasticsearch_spark.llm.multimodal import (
        _AFP_RADIUS,
        audio_fingerprint_neardup,
    )

    out = audio_fingerprint_neardup(spark, sf_dir).collect()
    assert all(0 <= r["hamming"] <= _AFP_RADIUS for r in out)
    n_docs = t(spark, sf_dir, "documents").count()
    constructed = {(2 * g, 2 * g + 1) for g in range(n_docs // 2)}
    got = {(r["doc_a"], r["doc_b"]) for r in out}
    assert len(got & constructed) / len(constructed) > 0.9
    assert len(got - constructed) < 0.05 * len(constructed)
