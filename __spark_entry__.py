"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

State (round 8): 363 registered queries, 345 with oracles.  The
session-3 continuation added the ES query-DSL tail
(`match_phrase_prefix`, `combined_fields`, `boosting_query`,
`pinned_query`, `span_first_or_query`), agg parity part 4
(`normalize_agg`, `frequent_item_sets_agg`, `bucket_correlation_agg`,
`scripted_metric_agg`), `geotile_grid_agg` + `geo_shape_polygon`
(no-libm Mercator polynomial / ray casting), the request-level APIs
(`search_template`, `terms_lookup_query`, `rank_eval_api`,
`explain_api`), `has_child_query` (parent-child join field), the LLM
objective preps (`fim_transform`, `mlm_masking_prep`,
`pack_sequences_bestfit`), all 100x-gated.  (Earlier this round: dependency-free PNG, GIF, and baseline-JPEG codecs — stdlib
zlib inflate + scanline unfilter for PNG, real variable-code-width
LZW both directions for GIF, and full T.81 baseline JPEG with
per-image optimized Huffman tables whose DC-exact mosaic corpus lets
a SQL oracle certify a LOSSY codec — certified by
`multimodal_decode_png` / `_gif` / `_jpeg` and by
`image_phash_dct_neardup`; `dup_span_remove_maximal`, the
Lee-et-al. variable-length substring dedup via gram-anchored
extend-and-merge with the span census in the certified hash;
`significant_text` (JLH over duplicate-filtered free text) and the
`suggest_phrase` bigram-LM did-you-mean completing the ES suggester
pair; `percentiles_bucket`, the last pipeline agg; manifest-pinned
time travel over the maintenance layer certified by
`time_travel_read`; `crawl_stats_stream`, a second certified
store riding the crawl drain — the streaming harnesses now share one
drain fixture, streaming/drain.py; ES agg parity part 3
(`top_metrics_agg`, `boxplot_agg`, `rate_agg`,
`variable_width_histogram_agg`, `cumulative_cardinality_agg`,
`change_point_agg`, `categorize_text_agg`, `geo_line_agg`);
`multi_match_dismax` + `intervals_ordered_query` closing the query-DSL
tail; `random_sampler_agg` (the sample itself certified via seeded
hash) + `moving_percentiles_agg`; `multimodal_mp4_meta` — real ISO
BMFF box-walk metadata, so every fixture mime now reaches a real
parser; `rag_chunk_retrieval`, the chunk→embed→score→parent-collapse
retriever as one certified plan; `geo_line_agg`; and
`data_recipe_epochs`, the training-mixture sizing calculation).
The eighteen rows-only entries are approximate/float/iterative by
design:
``agg_approx`` (HLL/quantile sketches — error-bound asserted in
tests), ``agg_count_min`` (count-min estimates, bounds pinned in
tests/test_cms.py),
``similarity_topk_fast`` (numpy float64 path, validated vs the exact
decimal twin in tests), ``ann_sq8`` (int8 scalar quantization —
recall@5 >= 0.95 vs exact + true-cosine re-rank pytest-pinned),
the product-quantization family ``ann_pq`` /
``ann_pq_stored`` / ``ann_pq_append`` / ``ann_ivfpq`` (trained float
codebooks; recall@5 vs exact, stored==fresh, and append==one-shot all
pytest-pinned), ``near_dedup_minhash_ml`` (MLlib MinHashLSH
internals), ``quality_classifier_lr`` (pyspark.ml fitting, AUC
asserted in tests), ``embedding_pca_project`` (eigendecomposition —
row-for-row vs numpy in tests), ``bpe_encode`` (iterative greedy merge
training — token-for-token vs an independent reference in tests),
``sketch_union_hll`` (Datasketches HLL estimates, 5%-bound asserted in
tests), ``unigram_tokenizer_train`` / ``unigram_encode_fertility``
(SentencePiece-style hard-EM training — Viterbi==brute-force and
property sweeps in tests/test_unigram.py), ``wordpiece_encode``
(greedy longest-match-first; piece-for-piece vs an independent
reference in tests/test_wordpiece.py), ``pack_sequences_bestfit``
(sequential per-shard best-fit-decreasing bin state in a grouped-map
pandas UDF — bin-for-bin vs an independent Python BFD in
tests/test_es_parity4.py), and ``stream_ingest_e2e``
(streaming drain).  Even
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
