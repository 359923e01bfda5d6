"""Streaming near-duplicate suppression: the batch MinHash+LSH pipeline
(llm/dedup.py) run incrementally under foreachBatch against an
accumulating signature store.

Per micro-batch:
  1. band signatures for the batch's docs (the shared
     minhash_band_sigs builder — same salts as the certified batch op);
  2. candidate = any doc agreeing with the STORE on >= `min_bands` of
     the 8 bands (band-bucket equi-join, never all-pairs);
  3. within-batch near-dups collapse to the lowest doc_id;
  4. survivors' signatures append to the store, survivor rows append to
     the output — so later batches dedupe against everything kept so
     far (the reference's idempotent-upsert idea lifted from exact keys
     to NEAR keys).

Scale posture: the store holds 8 rows x 32-byte sig per KEPT doc (tiny
vs the corpus); both joins are equi on (band, sig); the store read is
partition-pruned by band if the store is written partitioned.  Exactly
the shape a 1000-executor curation stream runs — checkpointing makes
the foreachBatch replays idempotent because dedup decisions are
deterministic functions of (store, batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from go_pulsar_elasticsearch_spark.llm.dedup import minhash_band_sigs

_MIN_BANDS = 4  # of 8: ~Jaccard >= 0.5 expected agreement


def _store(spark: SparkSession, path: str) -> DataFrame:
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return spark.createDataFrame(
            [], "doc_id long, band int, sig string"
        )


def dedup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    store_path: str,
    out_path: str,
    min_bands: int = _MIN_BANDS,
) -> None:
    """foreachBatch body: suppress docs near-duplicating the store or a
    lower-id batch mate; append survivors (rows + signatures)."""
    sigs = minhash_band_sigs(batch_df).persist()
    store = _store(spark, store_path)
    vs_store = (
        sigs.join(store.select("band", "sig"), ["band", "sig"])
        .groupBy("doc_id")
        .agg(F.countDistinct("band").alias("n_bands"))
        .filter(F.col("n_bands") >= min_bands)
        .select("doc_id")
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    vs_batch = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") > F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(F.countDistinct("a.band").alias("n_bands"))
        .filter(F.col("n_bands") >= min_bands)
        .select("doc_id")
    )
    dupes = vs_store.union(vs_batch).distinct()
    survivors = batch_df.join(dupes, "doc_id", "left_anti")
    sigs.join(dupes, "doc_id", "left_anti").write.mode("append").parquet(
        store_path
    )
    survivors.write.mode("append").parquet(out_path)
    sigs.unpersist()


def run_incremental_near_dedup(
    source: DataFrame, store_path: str, out_path: str, checkpoint: str
):
    """Wire a streaming docs source (doc_id, text) through the
    incremental near-dedup; returns the started query."""

    def body(batch_df: DataFrame, epoch_id: int) -> None:
        dedup_batch(
            batch_df.sparkSession, batch_df, store_path, out_path
        )

    return (
        source.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
