"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

State (round 6): 253 registered queries, 241 with oracles (new this
round: the delivery loop as a LIVE StreamingQuery with mid-drain
checkpoint restart; stored ANN index probes — `ann_ivf_stored` and the
append-only `ann_ivf_append` both hash-certified by ann_ivf's own
oracle, `ann_pq_stored` rows-only with a stored==fresh pytest — URL
canonicalization + canonical-URL dedup, and duplicate-span REMOVAL
with the reassembled text in the hash).
The twelve rows-only entries are approximate/float/iterative by
design:
``agg_approx`` (HLL/quantile sketches — error-bound asserted in
tests), ``agg_count_min`` (count-min estimates, bounds pinned in
tests/test_cms.py), ``multimodal_features`` (mapInPandas byte-stub decode),
``similarity_topk_fast`` (numpy float64 path, validated vs the exact
decimal twin in tests), ``ann_pq`` + ``ann_pq_stored`` (product quantization, recall@5
0.98 vs exact in tests), ``near_dedup_minhash_ml`` (MLlib MinHashLSH
internals), ``quality_classifier_lr`` (pyspark.ml fitting, AUC
asserted in tests), ``embedding_pca_project`` (eigendecomposition —
row-for-row vs numpy in tests), ``bpe_encode`` (iterative greedy merge
training — token-for-token vs an independent reference in tests),
``sketch_union_hll`` (Datasketches HLL estimates, 5%-bound asserted in
tests), and ``stream_ingest_e2e`` (streaming drain).  Even
the iterative k-means training and 3-iteration PageRank are oracled
(unrolled exact-decimal CTE iterations), and the Avro decode is
certified as a real binary round-trip.

All real code lives in ``go_pulsar_elasticsearch_spark/``; this module
only adapts the package registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import go_pulsar_elasticsearch_spark as gpe
from go_pulsar_elasticsearch_spark.registry import ORACLES, QUERIES

gpe.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["join_multiway_star"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin per query (rows-only ops are omitted)."""
    return dict(ORACLES)
