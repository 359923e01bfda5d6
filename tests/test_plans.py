"""Physical-plan assertions (SURVEY.md §4): the properties that make
these operators viable at 100 TB, checked mechanically so regressions
in plan shape fail CI, not a cluster bill."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

import go_pulsar_elasticsearch_spark as gpe
from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.plans.inspect import (
    formatted_plan,
    has_partial_aggregate,
    has_pushed_filter,
    join_kinds,
    read_schema_columns,
    uses_take_ordered,
)
from go_pulsar_elasticsearch_spark.registry import QUERIES

gpe.load_all()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = QUERIES["filter_predicates"](spark, sf_dir)
    assert has_pushed_filter(df, "l_returnflag")
    assert has_pushed_filter(df, "l_quantity")


def test_column_pruning(spark, sf_dir):
    df = QUERIES["project_rename_cast"](spark, sf_dir)
    cols = read_schema_columns(df)
    assert set(cols) <= {
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }
    assert "l_comment" not in cols and "l_partkey" not in cols


def test_star_join_broadcasts_dims(spark, sf_dir):
    df = QUERIES["join_multiway_star"](spark, sf_dir)
    kinds = join_kinds(df)
    assert "BroadcastHashJoin" in kinds


def test_aggregate_is_two_phase(spark, sf_dir):
    df = QUERIES["agg_grouped"](spark, sf_dir)
    assert has_partial_aggregate(df)


def test_topk_avoids_global_sort(spark, sf_dir):
    df = QUERIES["limit_topk"](spark, sf_dir)
    assert uses_take_ordered(df)


def test_metadata_query_prunes_payload(spark, sf_dir):
    """multimodal_meta must not read payload bytes column-wise beyond the
    text column it derives from — documents' parquet scan is pruned."""
    df = QUERIES["multimodal_meta"](spark, sf_dir)
    cols = read_schema_columns(df)
    assert "text" in cols and "doc_id" in cols
    # n_chars/lang never referenced
    assert "n_chars" not in cols and "lang" not in cols


def test_no_cartesian_in_ann(spark, sf_dir):
    """ann_lsh_bucketed's candidate join is equi on the bucket code —
    never a nested-loop over all pairs."""
    df = QUERIES["ann_lsh_bucketed"](spark, sf_dir)
    plan = formatted_plan(df)
    # the candidate join must not be a cartesian product
    assert "CartesianProduct" not in plan


def test_ivf_assignment_is_broadcast(spark, sf_dir):
    """ann_ivf's centroid assignment must broadcast the centroid set (a
    map-side pass over the big table); the candidate probe join is equi
    on the list id.  Neither may plan as a CartesianProduct."""
    df = QUERIES["ann_ivf"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Bucketing both sides on the join key removes the shuffle entirely
    — the 100 TB strategy for repeated orders⋈lineitem joins."""
    from go_pulsar_elasticsearch_spark.plans.inspect import exchange_count

    # raw scans, NOT catalog.t(): the scan-parallelism repair hashes
    # orders/lineitem on their orderkeys, which already co-partitions
    # this join (an implicit bucketing) and would erase the
    # bucketed-vs-plain difference this test demonstrates
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for tbl in ("b_orders", "b_lineitem"):
        shutil.rmtree(os.path.join(wh, tbl), ignore_errors=True)
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .mode("overwrite").saveAsTable("b_orders"))
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .mode("overwrite").saveAsTable("b_lineitem"))
    bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
    # disable broadcast so both plans use a shuffle-or-bucket join — at
    # test scale everything broadcasts and hides the difference
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey).groupBy(
            "o_orderstatus"
        ).count()
        plain = o.join(li, o.o_orderkey == li.l_orderkey).groupBy(
            "o_orderstatus"
        ).count()
        # plain SMJ shuffles both join sides + the agg; bucketed only the agg
        assert exchange_count(joined) < exchange_count(plain)
        assert len(joined.collect()) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_nested_exists_is_shuffle_free(spark, sf_dir):
    """ES nested-query parity must stay a scan-fused projection — the
    per-element predicate never explodes or shuffles."""
    from go_pulsar_elasticsearch_spark.plans.inspect import exchange_count

    df = QUERIES["nested_tags_exists"](spark, sf_dir)
    assert exchange_count(df) == 0
    plan = formatted_plan(df)
    assert "Generate" not in plan  # no explode in the exists path


def test_gopher_rules_are_shuffle_free(spark, sf_dir):
    from go_pulsar_elasticsearch_spark.plans.inspect import exchange_count

    assert exchange_count(QUERIES["gopher_quality_filter"](spark, sf_dir)) == 0
    assert exchange_count(QUERIES["search_highlight"](spark, sf_dir)) == 0


def test_composite_page_uses_topk(spark, sf_dir):
    """Keyset pagination must plan as TakeOrderedAndProject over the
    aggregated buckets, not a global sort."""
    df = QUERIES["composite_agg_page"](spark, sf_dir)
    assert uses_take_ordered(df)


def test_interp_linear_windows_use_two_linear_sorts(spark, sf_dir):
    """The four ignore-nulls fill columns ride two Window passes: a
    running last() on (hour ASC) and one on (hour DESC) — NEVER a
    (current row -> unbounded following) shrinking frame, which Spark
    evaluates O(n^2) per partition.  So: exactly 2 sorts, and no
    Following-bounded frame in the plan."""
    from go_pulsar_elasticsearch_spark.plans.inspect import exchange_count

    df = QUERIES["interp_linear"](spark, sf_dir)
    assert exchange_count(df) <= 4
    plan = formatted_plan(df)
    assert plan.count("+- Sort") == 2
    assert "unboundedfollowing" not in plan.lower()


def test_large_side_does_not_broadcast_below_threshold(spark, sf_dir):
    """Broadcast is a size decision, not a default: with the threshold
    forced down, the orders⋈lineitem join must plan a non-broadcast
    strategy (SMJ/SHJ) — guarding against hint creep that would ship a
    100 TB side to every executor."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    try:
        o = t(spark, sf_dir, "orders")
        li = t(spark, sf_dir, "lineitem")
        joined = o.join(li, o.o_orderkey == li.l_orderkey).groupBy(
            "o_orderstatus"
        ).count()
        kinds = join_kinds(joined)
        assert "BroadcastHashJoin" not in kinds, kinds
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_no_sizes_or_counts_rejoin_in_dedup_family(spark, sf_dir):
    """Round-4 structural guarantee, asserted on the OPTIMIZED logical
    plan (stable across cache/AQE state, unlike textual exchange
    counts — PLANS.md records those per round): the posting-list ops
    must not re-aggregate per-doc sizes or collapse-group counts into a
    separate frame that is joined back on.  Sizes/weights ride the
    posting list map-side, so no `Aggregate [doc_id]`-shaped subtree
    may appear in these plans (the pair aggregation groups on BOTH ids
    and is allowed; exact_text_groups' collapse groups on the hash)."""
    for name in ["ngram_jaccard", "minhash_verify_jaccard",
                 "minhash_recall_eval"]:
        df = QUERIES[name](spark, sf_dir)
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        for line in opt.splitlines():
            ln = line.strip().lstrip("+-: ")
            if ln.startswith("Aggregate ["):
                keys = ln.split("[", 1)[1].split("]", 1)[0]
                assert not (
                    keys.count("#") == 1 and "doc_id" in keys
                ), f"{name}: single-doc_id-keyed aggregate (sizes re-join?): {ln[:120]}"


def test_no_global_sort_in_prefix_ops(spark, sf_dir):
    """The functions/prefix.py rewrites must never reintroduce the
    Exchange SinglePartition + global Sort pair on a data-sized frame:
    every Sort in these plans is within range partitions, and the only
    SinglePartition exchanges feed scalar/bounded aggregates, never a
    Sort."""
    from go_pulsar_elasticsearch_spark.plans.inspect import formatted_plan

    for name in ["curation_pipeline", "pack_sequences", "late_data_profile",
                 "rfm_segmentation"]:
        plan = formatted_plan(QUERIES[name](spark, sf_dir))
        lines = [ln.strip() for ln in plan.splitlines()]
        for i, ln in enumerate(lines):
            if "Arguments: SinglePartition" in ln:
                # the node two lines up is the Exchange; its parent
                # (previous numbered node) must not be a Sort
                above = [l for l in lines[:i] if l.startswith("(")]
                if len(above) >= 2:
                    assert not above[-2].endswith(" Sort"), (
                        f"{name}: global sort fed by SinglePartition exchange"
                    )
