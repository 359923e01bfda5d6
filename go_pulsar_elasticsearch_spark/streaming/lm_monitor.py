"""Streaming LM-quality monitor: the batch ``lm_perplexity_bucket``
(llm/lm_score.py) run incrementally under foreachBatch against an
accumulating unigram-count store — live quality gating for a curation
stream, where the LM the scores come from is "everything ingested so
far" rather than a frozen corpus.

Per micro-batch:
  1. token counts for the batch's docs (same tokenization as the
     certified batch op);
  2. LM-so-far = store counts from STRICTLY-PRIOR epochs + this
     batch's counts (so a batch is scored against a model that already
     includes it — matching what the batch operator computes once the
     stream has delivered everything);
  3. per-doc cross-entropy + head/middle/tail bucket against that LM
     (identical round-6-ln + exact-decimal arithmetic);
  4. batch counts and scored rows land under ``epoch=<batch_id>``
     directories written with overwrite.

Replay safety: same contract as streaming/near_dedup.py — the store
read sees only epochs strictly below the current one and both writes
are epoch-keyed overwrites, so a checkpoint replay of a half-committed
batch recomputes byte-identical outputs.

Convergence (pytest-pinned in tests/test_streaming_lm.py): after the
final micro-batch the accumulated store holds exactly the whole-corpus
counts, so scoring the full corpus against the store reproduces the
certified batch operator's rows EXACTLY (same doubles, same buckets).

Scale posture: the store grows with VOCABULARY (Heaps-sublinear), not
stream length; each batch does one token count (map-side combined), a
vocab-sized merge, and the same two token-keyed shuffles as the batch
op — nothing accumulates per-row state in the streaming engine itself,
so no watermark is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from go_pulsar_elasticsearch_spark.streaming.store import read_store_or_empty

# the batch op's exact tokenization + scoring arithmetic, imported (not
# copied) so the monitor can never drift from the certified operator;
# re-exported for callers of this module
from go_pulsar_elasticsearch_spark.llm.lm_score import (  # noqa: F401
    score_docs,
    tokenize,
)


def read_store(spark: SparkSession, path: str) -> DataFrame:
    return read_store_or_empty(spark, path, "word string, c long, epoch long")


def accumulated_counts(spark: SparkSession, store_path: str,
                       below_epoch: int | None = None) -> DataFrame:
    """Merged (word, c) view of the store — optionally only epochs
    strictly below ``below_epoch`` (the replay-safe read)."""
    st = read_store(spark, store_path)
    if below_epoch is not None:
        st = st.filter(F.col("epoch") < F.lit(below_epoch))
    return st.groupBy("word").agg(F.sum("c").alias("c"))


def score_lm_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    store_path: str,
    out_path: str,
    epoch_id: int = 0,
) -> None:
    """foreachBatch body: extend the LM with this batch's counts and
    score the batch against the extended LM; epoch-keyed overwrites."""
    bcnt = (
        tokenize(batch_df)
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    # epoch comes from the directory partition on read (writing it as a
    # data column too would collide with partition discovery)
    bcnt.write.mode("overwrite").parquet(f"{store_path}/epoch={epoch_id}")
    prior = accumulated_counts(spark, store_path, below_epoch=epoch_id)
    lm_so_far = (
        prior.unionByName(bcnt).groupBy("word").agg(F.sum("c").alias("c"))
    )
    scored = score_docs(batch_df, lm_so_far)
    scored.write.mode("overwrite").parquet(f"{out_path}/epoch={epoch_id}")


def run_lm_monitor(spark: SparkSession, src_path: str, store_path: str,
                   out_path: str, checkpoint: str) -> None:
    """Drive the monitor over a parquet-file stream of documents rows
    (one micro-batch per file), draining everything available."""
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string,"
            " n_chars long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src_path)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, eid: score_lm_batch(
                df.sparkSession, df, store_path, out_path, epoch_id=eid
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        # a silent partial drain would let callers read a half-written
        # epoch; stop the leaked query and fail loudly instead
        q.stop()
        raise TimeoutError("lm monitor drain did not finish within 180s")
