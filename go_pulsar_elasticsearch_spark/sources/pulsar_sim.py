"""Pulsar-shaped Python Data Source (Spark 4 DataSource API).

The reference's source is a Pulsar Shared-subscription consumer
delivering Avro `IngestionData` records (pulsar.go:80-111,
index_topic.avro:1-52).  The real connector needs the pulsar-spark jar;
this module provides the same SOURCE SURFACE as a pure-Python data
source — `spark.read.format("pulsar_sim")` for batch and
`spark.readStream.format("pulsar_sim")` for micro-batched streaming —
so the ingest pipeline is exercised end-to-end through Spark's actual
source API (offsets, partitions, schema) rather than a pre-built
DataFrame.

Records are DETERMINISTIC (seeded by record index), shaped exactly like
the reference's input: identifier, name, uuid, type, ingestion_time
(epoch millis), tags (nullable array<struct<type,value>>) — including
duplicate uuids (to exercise last-write-wins upsert, es.go:186) and
null tags (the Avro union default, index_topic.avro:49).

Scale posture: batch reads split into `numPartitions` independent
InputPartitions (each generates its slice — the executor-parallel
shape of a real partitioned topic); the stream reader hands out offset
ranges per micro-batch, `rowsPerBatch` at a time, mirroring
maxOffsetsPerTrigger-style rate limiting (≡ the reference's receive
queue bound, .env:7).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_SCHEMA = StructType(
    [
        StructField("identifier", StringType()),
        StructField("name", StringType()),
        StructField("uuid", StringType()),
        StructField("type", StringType()),
        StructField("ingestion_time", LongType()),
        StructField(
            "tags",
            ArrayType(
                StructType(
                    [
                        StructField("type", StringType()),
                        StructField("value", StringType()),
                    ]
                )
            ),
            nullable=True,
        ),
    ]
)

_BASE_MS = 1_700_000_000_000
_TYPES = ("DATASET", "MODEL", "RUN")


def _record(i: int) -> tuple:
    """Deterministic IngestionData record #i.  Every 5th record reuses
    the previous uuid (duplicate delivery); every 7th has null tags
    (the Avro union default)."""
    h = hashlib.md5(f"rec:{i}".encode()).hexdigest()
    uuid_i = i - 1 if i % 5 == 0 and i > 0 else i
    tags = (
        None
        if i % 7 == 0
        else [("source", f"src{i % 10}"), ("h", h[:6])]
    )
    return (
        f"id-{h[:8]}",
        f"name-{i}",
        f"uuid-{uuid_i:08d}",
        _TYPES[i % len(_TYPES)],
        _BASE_MS + i * 1000,
        tags,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("numrows", 1000))
        self.parts = int(options.get("numpartitions", 4))

    def partitions(self):
        step = max(1, self.n // self.parts)
        bounds = list(range(0, self.n, step)) + [self.n]
        return [
            _RangePartition(a, b) for a, b in zip(bounds, bounds[1:])
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _record(i)


class _StreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsperbatch", 100))
        self.max_rows = int(options.get("maxrows", 10**9))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        lo = start["index"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        return (iter([_record(i) for i in range(lo, hi)]), {"index": hi})

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # replay for recovery: offsets fully determine the data
        return iter([_record(i) for i in range(start["index"], end["index"])])

    def commit(self, end: dict) -> None:
        pass  # offsets are self-describing; nothing to clean up


class PulsarSimDataSource(DataSource):
    """format("pulsar_sim") — options: numRows/numPartitions (batch),
    rowsPerBatch/maxRows (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "pulsar_sim"

    def schema(self) -> StructType:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(PulsarSimDataSource)
