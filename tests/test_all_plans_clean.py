"""Blanket plan hygiene across the ENTIRE query registry: no plan may
contain a CartesianProduct or a row-at-a-time Python UDF, and no batch
operator may use a Following-bounded shrinking window frame (Spark
evaluates those O(n^2) per partition — see interp_linear's history).

This is the regression net for the whole §2B surface at once; per-op
shape assertions live in test_plans.py.
"""

from __future__ import annotations

import pytest

import go_pulsar_elasticsearch_spark as gpe
from go_pulsar_elasticsearch_spark.registry import QUERIES

gpe.load_all()

# streaming jobs can't be explained as batch plans
_SKIP = {"stream_ingest_e2e"}

# full-partition frames (unbounded preceding AND following) are computed
# once per partition — linear, allowed.  Only the shrinking form
# (current row -> unbounded following) is quadratic; it prints as
# specifiedwindowframe(RowFrame, currentrow$(), unboundedfollowing$()).
_SHRINKING = "currentrow$(),unboundedfollowing$()"


# Global-order windows (Window.orderBy with NO partitionBy -> Exchange
# SinglePartition + global sort) are the one construct that cannot scale
# past one executor.  Allowed ONLY where the windowed frame is
# data-size-independent by construction:
#   - curation_pipeline: prefix-sum offsets over n_partitions rows (16)
#   - histogram_equi_width / interp_linear-style grids: bounded bins
# Every other query must keep windows partitioned.
_GLOBAL_WINDOW_OK = {
    "bm25_search",            # rank over the post-limit top-k rows only
    "search_request_e2e",     # rank over the post-limit top-k rows only
                              # (TakeOrderedAndProject feeds the window)
    "rrf_hybrid_search",      # both rank windows run after .limit(k)
    "more_like_this",         # top-idf term table: vocab-bounded
    "significant_terms",      # vocab-bounded term table
    "vocab_topk",             # vocab-bounded
    "bpe_merge_stats",        # char-pair vocab-bounded table
    "cooccurrence_pmi",       # |vocab|^2-bounded pair table
    "quality_drift_monitor",  # 30-row daily rollup
    "sql_surface_lateral",    # SQL front-door demo: the statement IS the op
    "search_field_collapse",  # group-head ranking: one row per source
                              # (source-cardinality-bounded) after rn=1
    "ts_znorm_subsequence_topk",  # anchor-pattern numbering: the global
                                  # ROW_NUMBER runs on ONE user's series
                                  # (filtered before the window)
    "search_rescore",         # final rank over the post-limit rescore
                              # window (<= 50 rows by ES contract)
    "sampler_diversified_agg",  # global rank over the post-limit sample
                                # (<= shard_size=20 rows)
    "significant_text",       # rank over the post-limit top-15 rows only
                              # (TakeOrderedAndProject feeds the window,
                              # the significant_terms pattern)
    "suggest_phrase",         # rank over the post-limit top-5 phrase
                              # candidates (edit-bounded, tiny)
    "multi_match_dismax",     # rank over the post-limit top-10 rows only
                              # (TakeOrderedAndProject feeds the window)
    "rag_chunk_retrieval",    # rank over the post-limit top-10 docs only
                              # (TakeOrderedAndProject feeds the window)
    "cumulative_cardinality_agg",  # running total over the DAY-count
                                   # bucket rollup (30 rows, bucket-sized
                                   # like quality_drift_monitor)
    "change_point_agg",       # CUSUM over the day-count bucket rollup
                              # (30 rows; raw rows never enter the window)
    "moving_percentiles_agg",  # trailing-5 window over the day-count
                               # bucket rollup (30 rows, same family)
    "combined_fields",        # rank over the post-limit top-10 rows only
                              # (TakeOrderedAndProject feeds the window)
    "boosting_query",         # rank over the post-limit top-10 rows only
    "pinned_query",           # rank over the post-limit organic top-10
                              # (pinned arm is a 3-row literal filter)
}


def _has_global_order_window(plan: str) -> bool:
    """Physical Window prints `Arguments: [exprs], [partSpec], [orderSpec]`
    with EMPTY groups omitted: a partitioned+ordered window shows two
    `], [` group separators, an unpartitioned (global) ordered window only
    one — and its last group carries the sort direction.  (A partition-only
    window also shows one separator but no ASC/DESC in the final group.)"""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if ln.strip().startswith("(") and ln.strip().endswith(" Window"):
            for j in range(i + 1, min(i + 4, len(lines))):
                arg = lines[j].strip()
                if arg.startswith("Arguments:"):
                    if arg.count("], [") == 1:
                        last = arg.rsplit("], [", 1)[-1]
                        if (" ASC" in last or " DESC" in last) and (
                            "_pid#" not in last
                        ):
                            # _pid-ordered windows are functions/prefix.py's
                            # offsets pass: n_partitions rows by construction
                            return True
                    break
    return False


@pytest.mark.parametrize("name", sorted(n for n in QUERIES if n not in _SKIP))
def test_plan_is_clean(spark, sf_dir, name):
    from go_pulsar_elasticsearch_spark.plans.inspect import formatted_plan

    plan = formatted_plan(QUERIES[name](spark, sf_dir))
    low = plan.lower()
    assert "cartesianproduct" not in low, f"{name}: cartesian product"
    # row-at-a-time python eval: BatchEvalPython; Arrow paths show up as
    # ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas and are fine
    assert "batchevalpython" not in low, f"{name}: non-Arrow python UDF"
    assert _SHRINKING not in low.replace(" ", ""), (
        f"{name}: shrinking window frame (O(n^2))"
    )
    if name not in _GLOBAL_WINDOW_OK:
        assert not _has_global_order_window(plan), (
            f"{name}: global-order window (Window.orderBy without "
            "partitionBy — SinglePartition sort; partition it or add to "
            "_GLOBAL_WINDOW_OK with a bounded-frame justification)"
        )
