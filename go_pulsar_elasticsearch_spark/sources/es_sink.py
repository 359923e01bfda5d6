"""Elasticsearch sink adapter (reference: pkg/es/es.go).

The reference bulk-indexes with DocumentID=uuid (last-write-wins upsert,
`es.go:186`), N workers, 5 MB/30 s flush (`es.go:161-168`), retry on
429/5xx with exponential backoff + request compression (`es.go:133-158`),
and a dated index behind an alias (`es.go:78-116`).

With the elasticsearch-spark connector every one of those is an option,
applied inside foreachBatch; without the jar (this container) the
parquet dated-partition sink in streaming/stream.py reproduces the same
semantics (key-addressed upsert + daily partitions) for tests.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class EsSinkOptions:
    """Mirror of the reference's EsOptions (es.go:33-44) + bulk tuning."""

    nodes: str = "localhost:9200"
    alias: str = "index_data"
    shards: int = 4        # .env:18
    replicas: int = 0      # .env:19
    refresh_interval: str = "10s"  # .env:21, mapping.json:5
    batch_entries: int = 1000      # ≡ MAX_BATCH_SIZE .env:16
    batch_bytes: str = "5mb"       # es.go:166
    retry_count: int = 10          # ≡ RETRIES .env:11
    retry_wait: str = "10s"        # ≡ INSERT_RETRY_DELAY .env:20

    def to_options(self, dated_index: str) -> dict[str, str]:
        return {
            "es.nodes": self.nodes,
            "es.resource": dated_index,
            "es.mapping.id": "uuid",            # es.go:186
            "es.write.operation": "index",      # last-write-wins upsert
            "es.batch.size.entries": str(self.batch_entries),
            "es.batch.size.bytes": self.batch_bytes,
            "es.batch.write.retry.count": str(self.retry_count),
            "es.batch.write.retry.wait": self.retry_wait,
        }


def write_batch_to_es(batch_df: DataFrame, opts: EsSinkOptions,
                      date_str: str) -> None:
    """foreachBatch body for a real ES cluster: writes to the daily index
    `<alias>_<date>` (es.go:79-81); alias flip stays an admin call."""
    target = f"{opts.alias}_{date_str}"
    (
        batch_df.write.format("org.elasticsearch.spark.sql")
        .options(**opts.to_options(target))
        .mode("append")
        .save()
    )
