"""WARC source: writer/parser round-trip, length-delimited robustness
(bodies quoting 'WARC/1.0'), per-file partitioning, and the registered
warc_ingest query's equality with the documents table."""

from __future__ import annotations

import pytest

from go_pulsar_elasticsearch_spark.sources.warc_source import (
    parse_warc,
    register_warc_source,
    write_warc,
)


def _rec(i, body):
    return {
        "record_id": f"urn:gpe:doc:{i}",
        "warc_type": "response",
        "target_uri": f"https://corpus.local/en/{i}",
        "warc_date": "2024-01-01T00:00:00Z",
        "body": body,
    }


def test_roundtrip_and_multibyte_lengths(tmp_path):
    recs = [
        _rec(0, "plain ascii"),
        _rec(1, "unicode — émojis 🚀 and CJK 中文"),
        _rec(2, ""),  # empty body
    ]
    p = str(tmp_path / "a.warc")
    write_warc(p, recs)
    out = list(parse_warc(open(p, "rb").read()))
    assert [r["body"] for r in out] == [r["body"] for r in recs]
    # Content-Length is BYTES, not chars
    assert out[1]["content_length"] == len(recs[1]["body"].encode("utf-8"))
    assert out[0]["record_id"] == "urn:gpe:doc:0"
    assert out[0]["warc_type"] == "response"


def test_body_quoting_warc_marker_parses(tmp_path):
    """A crawl page QUOTING a WARC record must not desync the parser —
    only Content-Length delimits the payload."""
    evil = "look at this:\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nfake"
    p = str(tmp_path / "b.warc")
    write_warc(p, [_rec(0, evil), _rec(1, "after")])
    out = list(parse_warc(open(p, "rb").read()))
    assert len(out) == 2
    assert out[0]["body"] == evil
    assert out[1]["body"] == "after"


def test_truncated_payload_raises(tmp_path):
    p = str(tmp_path / "c.warc")
    write_warc(p, [_rec(0, "full body here")])
    data = open(p, "rb").read()
    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc(data[:-10]))


def test_partitions_one_per_file_and_scan(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    for i in range(3):
        write_warc(str(d / f"f{i}.warc"), [_rec(10 * i + j, f"doc {i}/{j}")
                                           for j in range(4)])
    register_warc_source(spark)
    df = spark.read.format("warc_sim").option("path", str(d)).load()
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 12
    assert set(df.columns) == {
        "record_id", "warc_type", "target_uri", "warc_date",
        "content_length", "body",
    }


def test_warc_ingest_matches_documents(spark, sf_dir):
    from go_pulsar_elasticsearch_spark.ingest.warc import warc_ingest
    from pyspark.sql import functions as F

    out = warc_ingest(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.concat(F.lit("https://corpus.local/"), "lang", F.lit("/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.octet_length("text").cast("long").alias("content_length"),
        F.col("text").alias("body"),
    )
    got = out.select("doc_id", "url", "content_length", "body")
    assert got.exceptAll(docs).count() == 0
    assert docs.exceptAll(got).count() == 0


def test_gzipped_warc_files_read(spark, tmp_path):
    import gzip

    from go_pulsar_elasticsearch_spark.sources.warc_source import (
        record_bytes,
    )

    d = tmp_path / "gz"
    d.mkdir()
    raw = b"".join(record_bytes(_rec(i, f"zipped {i}")) for i in range(5))
    (d / "seg.warc.gz").write_bytes(gzip.compress(raw))
    write_warc(str(d / "plain.warc"), [_rec(99, "plain")])
    register_warc_source(spark)
    df = spark.read.format("warc_sim").option("path", str(d)).load()
    assert df.rdd.getNumPartitions() == 2  # one per file, gz included
    assert df.count() == 6


def test_non_utf8_body_degrades_not_crashes():
    """Foreign crawl payloads (latin-1 etc.) must parse with U+FFFD
    replacement, never raise."""
    body = "caf\xe9".encode("latin-1")
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:x:1>\r\nWARC-Date: d\r\n"
        b"WARC-Target-URI: u\r\n"
        + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
        + body + b"\r\n\r\n"
    )
    out = list(parse_warc(raw))
    assert len(out) == 1
    assert out[0]["body"].startswith("caf")
    assert "�" in out[0]["body"]


def test_malformed_record_id_not_mangled():
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:unterminated\r\nWARC-Date: d\r\n"
        b"WARC-Target-URI: u\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    out = list(parse_warc(raw))
    # no closing '>': value passes through verbatim, nothing stripped
    assert out[0]["record_id"] == "<urn:unterminated"


def test_stream_tails_spool_and_rate_limits(spark, tmp_path):
    """readStream over the spool: existing files drain in
    maxFilesPerBatch-bounded micro-batches; files arriving later are
    picked up on the next trigger; every record exactly once."""
    d = tmp_path / "spool"
    d.mkdir()
    for i in range(3):
        write_warc(str(d / f"seg-{i:03d}.warc"),
                   [_rec(100 * i + j, f"s{i}/{j}") for j in range(4)])
    register_warc_source(spark)
    stream = (
        spark.readStream.format("warc_sim")
        .option("path", str(d))
        .option("maxFilesPerBatch", 1)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("warc_spool_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.table("warc_spool_out")
        assert out.count() == 12
        # a new segment lands in the spool -> next trigger ingests it
        write_warc(str(d / "seg-900.warc"), [_rec(900, "late segment")])
        q.processAllAvailable()
    finally:
        q.stop()
    assert out.count() == 13
    assert out.select("record_id").distinct().count() == 13


def test_stream_rejects_stalling_rate_limit(tmp_path):
    """maxFilesPerBatch=0 would make the stream poll forever without
    progress — the reader must refuse it at construction."""
    from go_pulsar_elasticsearch_spark.sources.warc_source import (
        _WarcStreamReader,
    )

    with pytest.raises(ValueError, match="maxFilesPerBatch"):
        _WarcStreamReader({"path": str(tmp_path), "maxfilesperbatch": "0"})


def test_stream_offset_prunes_retired_segments(tmp_path):
    """Retention deletes a consumed segment -> the next offset drops
    its name; replay of the new batch is unaffected."""
    from go_pulsar_elasticsearch_spark.sources.warc_source import (
        _WarcStreamReader,
    )

    d = tmp_path / "spool2"
    d.mkdir()
    write_warc(str(d / "a.warc"), [_rec(1, "one")])
    r = _WarcStreamReader({"path": str(d)})
    it1, off1 = r.read(r.initialOffset())
    assert len(list(it1)) == 1 and off1["files"] == ["a.warc"]
    # retention retires a.warc; a new segment arrives
    (d / "a.warc").unlink()
    write_warc(str(d / "b.warc"), [_rec(2, "two")])
    it2, off2 = r.read(off1)
    assert [row[0] for row in it2] == ["urn:gpe:doc:2"]
    assert off2["files"] == ["b.warc"]  # a.warc pruned, not reconsumed


def test_stream_crawl_intake_through_quality_gate(spark, sf_dir, tmp_path):
    """End-to-end crawl intake: the documents corpus lands as WARC
    segments in a spool, streams through the SAME gopher_gate transform
    the batch operator certifies, and the streamed verdicts equal the
    batch run over the original parquet row-for-row."""
    from pyspark.sql import functions as F

    from go_pulsar_elasticsearch_spark.ingest.warc import _materialize_warc
    from go_pulsar_elasticsearch_spark.llm.quality import gopher_gate

    spool = _materialize_warc(sf_dir)
    register_warc_source(spark)
    stream = (
        spark.readStream.format("warc_sim")
        .option("path", spool)
        .option("maxFilesPerBatch", 3)
        .load()
        .select(
            F.regexp_extract("record_id", r"urn:gpe:doc:(\d+)", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("body").alias("text"),
        )
    )
    q = (
        gopher_gate(stream)
        .writeStream.format("memory")
        .queryName("warc_gate_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.table("warc_gate_out")
    batch = gopher_gate(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    assert streamed.count() == batch.count() > 0
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
