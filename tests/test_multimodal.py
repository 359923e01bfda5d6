"""Multimodal column plumbing: binary payloads, typed metadata, the
mapInPandas decode stub (SURVEY.md §2B multimodal_columns)."""

from __future__ import annotations

import pytest

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.llm.multimodal import (
    decode_payload,
    extract_features,
    with_payload,
)


def test_payload_schema(spark, sf_dir):
    m = with_payload(t(spark, sf_dir, "documents"))
    kinds = dict(m.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["media_meta"].startswith("struct<mime:string,byte_len:bigint")


def test_decode_stub_gates_real_codecs():
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x89PNG", "image/png")


def test_fake_decoder_deterministic():
    out = decode_payload(b"abcd" * 100, "image/png", fake=True)
    assert out["byte_len"] == 400
    assert out["n_frames"] == 2
    assert out["head_hex"] == "61626364"
    assert out["mean_byte"] == sum(b"abcd") / 4


def test_extract_features_matches_local_decode(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").limit(20)
    feats = {r["doc_id"]: r for r in extract_features(with_payload(docs)).collect()}
    for row in docs.collect():
        payload = row["text"].encode("utf-8")
        expect = decode_payload(payload, "x", fake=True)
        got = feats[row["doc_id"]]
        assert got["byte_len"] == expect["byte_len"]
        assert got["mean_byte"] == pytest.approx(expect["mean_byte"])
        assert got["n_frames"] == expect["n_frames"]
        assert got["head_hex"] == expect["head_hex"]


def test_frame_sampling_bytes(spark, sf_dir):
    """Sampled frames carry the exact payload slices at the right
    offsets (frame k covers bytes [k*256, (k+1)*256))."""
    from go_pulsar_elasticsearch_spark.llm.multimodal import sample_frames

    docs = t(spark, sf_dir, "documents").limit(5)
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
