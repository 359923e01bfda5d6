"""Temporal versioning: slowly-changing-dimension (type 2) history from
a change feed.

The reference's sink is last-write-wins by uuid (es.go:186) — history is
destroyed on every update.  scd2_history is the warehouse-grade
alternative: every change becomes a validity interval
[valid_from, valid_to), the current version is flagged, and point-in-
time queries become a range predicate.  This is the canonical
"dimension table from a CDC stream" operator.

100 TB posture: one window shuffle on the business key; the lead()
computing valid_to shares the exchange+sort with version_n (same
partitionBy/orderBy), so Catalyst plans a single Window node.  In
production the same transform runs inside foreachBatch over the CDC
stream with the previous snapshot unioned in — identical plan shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

_SCD2_ORACLE = """
SELECT
  o_custkey,
  o_orderkey AS change_id,
  o_totalprice AS tracked_value,
  o_orderdate AS valid_from,
  LEAD(o_orderdate) OVER w AS valid_to,
  CAST(ROW_NUMBER() OVER w AS BIGINT) AS version_n,
  LEAD(o_orderdate) OVER w IS NULL AS is_current
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


_PIT_ORACLE = """
WITH hist AS (
  SELECT o_custkey, o_totalprice, o_orderdate AS valid_from,
         LEAD(o_orderdate) OVER w AS valid_to,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS version_n
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
)
SELECT f.o_orderkey, f.o_custkey, f.o_orderdate,
       f.o_orderdate - INTERVAL 90 DAY AS as_of_ts,
       h.version_n AS asof_version,
       h.o_totalprice AS asof_value,
       h.valid_from AS asof_valid_from
FROM orders f
JOIN hist h
  ON f.o_custkey = h.o_custkey
 AND h.valid_from <= f.o_orderdate - INTERVAL 90 DAY
 AND (h.valid_to IS NULL OR f.o_orderdate - INTERVAL 90 DAY < h.valid_to)
"""


@register("pit_join_scd2", _PIT_ORACLE)
def pit_join_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each order looks up the customer's version in
    effect 90 days before it (the feature-store "as-of the label time"
    lookup over an SCD2 dimension).

    Spark-first shape: instead of a key+range join (which explodes to
    facts x versions before filtering), union the version rows and the
    shifted fact rows, sort once per key by (time, is_fact, version_n),
    and carry the latest version forward with last(ignorenulls) over a
    running-rows frame.  All three payload columns ride the SAME window,
    so the whole lookup is ONE shuffle on the business key (plus the one
    that builds the history; pre-materialized in production).  Facts
    whose as-of instant precedes every version drop out (inner PIT);
    empty intervals from same-timestamp versions lose to the higher
    version_n exactly like the oracle's [from, to) predicate."""
    tune(spark)
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dim = o.select(
        "o_custkey",
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_fact"),
        F.row_number().over(w).cast("bigint").alias("version_n"),
        F.col("o_totalprice").alias("dim_value"),
        F.col("o_orderdate").alias("dim_valid_from"),
        F.lit(None).cast("bigint").alias("fact_orderkey"),
        F.lit(None).cast("timestamp").alias("fact_orderdate"),
    )
    fact = o.select(
        "o_custkey",
        (F.col("o_orderdate") - F.expr("INTERVAL 90 DAYS")).alias("t"),
        F.lit(1).alias("is_fact"),
        F.lit(None).cast("bigint").alias("version_n"),
        F.lit(None).cast("double").alias("dim_value"),
        F.lit(None).cast("timestamp").alias("dim_valid_from"),
        F.col("o_orderkey").alias("fact_orderkey"),
        F.col("o_orderdate").alias("fact_orderdate"),
    )
    asof = (
        Window.partitionBy("o_custkey")
        .orderBy("t", "is_fact", "version_n")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = dim.unionByName(fact).select(
        "o_custkey",
        "is_fact",
        "fact_orderkey",
        "fact_orderdate",
        "t",
        F.last("version_n", ignorenulls=True).over(asof).alias("asof_version"),
        F.last("dim_value", ignorenulls=True).over(asof).alias("asof_value"),
        F.last("dim_valid_from", ignorenulls=True).over(asof).alias("asof_valid_from"),
    )
    return carried.filter(
        (F.col("is_fact") == 1) & F.col("asof_version").isNotNull()
    ).select(
        F.col("fact_orderkey").alias("o_orderkey"),
        "o_custkey",
        F.col("fact_orderdate").alias("o_orderdate"),
        F.col("t").alias("as_of_ts"),
        "asof_version",
        "asof_value",
        "asof_valid_from",
    )


@register("scd2_history", _SCD2_ORACLE)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders as a change feed per customer -> type-2 history: validity
    interval, version number, current flag.  valid_to, version_n and
    is_current all ride ONE window (same partition/order), so the op
    costs a single shuffle on the business key; ties broken by the
    change id for determinism."""
    tune(spark)
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    valid_to = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        F.col("o_orderkey").alias("change_id"),
        F.col("o_totalprice").alias("tracked_value"),
        F.col("o_orderdate").alias("valid_from"),
        valid_to.alias("valid_to"),
        F.row_number().over(w).cast("bigint").alias("version_n"),
        valid_to.isNull().alias("is_current"),
    )


# --------------------------------------------------------------------------
# cdc_apply_changes
# --------------------------------------------------------------------------

_CDC_ORACLE = """
WITH feed AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
  FROM events
), ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_changes
  FROM feed
)
SELECT user_id, value AS last_value, ts AS last_ts, n_changes
FROM ranked
WHERE rn = 1 AND op = 'U'
"""


@register("cdc_apply_changes", _CDC_ORACLE)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC change feed to produce the current snapshot — the
    MERGE/apply-changes step every lakehouse ingest pipeline runs, and
    the exact semantics of the reference's last-write-wins-by-uuid sink
    (es.go:186: DocumentID=uuid, action `index`) EXTENDED with deletes,
    which the reference cannot express (ES would need action `delete`).

    Feed = events keyed by user_id, ordered by (ts, event_id); an
    'error' event is a tombstone (op=D), everything else an upsert
    (op=U).  A key whose latest change is a tombstone vanishes from the
    snapshot; otherwise the latest value wins.

    100 TB posture: ONE shuffle on the business key; both window
    functions share the exchange+sort (same partitionBy).  In production
    the feed is the last micro-batch unioned with the previous snapshot
    (see scd2_history's foreachBatch note) — identical plan, and AQE
    handles hot keys."""
    tune(spark)
    events = t(spark, sf_dir, "events")
    feed = events.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wc = Window.partitionBy("user_id")
    return (
        feed.withColumn("rn", F.row_number().over(w))
        .withColumn("n_changes", F.count("*").over(wc))
        .filter((F.col("rn") == 1) & (F.col("op") == "U"))
        .select(
            "user_id",
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
            "n_changes",
        )
    )


# --------------------------------------------------------------------------
# cdc_merge_apply  (MERGE INTO semantics: apply an I/U/D change feed to a
# base table in one shuffle-join pass — the Delta/Iceberg MERGE shape
# without a table format, which is how a 100 TB upsert actually executes:
# anti join for deletes, left join for updates, union for inserts)
# --------------------------------------------------------------------------

_CDC_ORACLE = """
WITH changes AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN 'D'
              WHEN o_orderkey % 7 IN (1, 2) THEN 'U'
              WHEN o_orderkey % 7 = 3 THEN 'I' END AS op,
         o_custkey, o_totalprice
  FROM orders WHERE o_orderkey % 7 <= 3
)
SELECT b.o_orderkey, b.o_custkey,
       CASE WHEN u.o_orderkey IS NOT NULL THEN b.o_totalprice + 100.0
            ELSE b.o_totalprice END AS o_totalprice,
       CASE WHEN u.o_orderkey IS NOT NULL THEN 'U' ELSE 'K' END AS op_applied
FROM orders b
LEFT JOIN (SELECT o_orderkey FROM changes WHERE op = 'U') u
  ON u.o_orderkey = b.o_orderkey
WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM changes WHERE op = 'D')
UNION ALL
SELECT -o_orderkey AS o_orderkey, o_custkey, o_totalprice, 'I' AS op_applied
FROM changes WHERE op = 'I'
"""


@register("cdc_merge_apply", _CDC_ORACLE)
def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO applied as DataFrame ops: a deterministic change feed
    (deletes for keys % 7 = 0, +100 price updates for % 7 in (1,2),
    inserts with negated keys for % 7 = 3) merges into the orders base:
    deletes via LEFT ANTI join, updates via LEFT join + coalesce,
    inserts via union.  All three branches shuffle on the merge key
    once each — at scale, bucket the base table by the key and the
    merge co-locates (same plan the lakehouse formats generate under
    MERGE INTO).  Surviving base rows carry op_applied K/U; inserts
    carry I."""
    tune(spark)
    base = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    k7 = F.col("o_orderkey") % 7
    changes = base.filter(k7 <= 3).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.when(k7 == 0, "D").when(k7.isin(1, 2), "U").otherwise("I").alias("op"),
    )
    deletes = changes.filter(F.col("op") == "D").select("o_orderkey")
    updates = changes.filter(F.col("op") == "U").select(
        "o_orderkey", F.lit(True).alias("_upd")
    )
    inserts = changes.filter(F.col("op") == "I").select(
        (-F.col("o_orderkey")).alias("o_orderkey"),
        "o_custkey",
        "o_totalprice",
        F.lit("I").alias("op_applied"),
    )
    survivors = (
        base.join(deletes, "o_orderkey", "left_anti")
        .join(updates, "o_orderkey", "left")
        .select(
            "o_orderkey",
            "o_custkey",
            F.when(F.col("_upd"), F.col("o_totalprice") + 100.0)
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            F.when(F.col("_upd"), "U").otherwise("K").alias("op_applied"),
        )
    )
    return survivors.unionByName(inserts)


# --------------------------------------------------------------------------
# interval_merge_overlaps  (gaps-and-islands: merge overlapping activity
# intervals per user — the classic sessionize-by-overlap shape, distinct
# from events_sessionize's fixed-gap rule: intervals here have explicit
# extents and merge whenever they OVERLAP, the form downtime windows,
# meeting scheduling, and span-coalescing jobs take)
# --------------------------------------------------------------------------

_IVM_EXTENT_S = 300  # each event opens a 5-minute activity interval

_IVM_ORACLE = f"""
WITH iv AS (
  SELECT user_id, event_id, ts AS s,
         ts + INTERVAL {_IVM_EXTENT_S} SECOND AS e
  FROM events
), flagged AS (
  SELECT user_id, s, e,
    CASE WHEN s <= MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING)
         THEN 0 ELSE 1 END AS new_island,
    event_id
  FROM iv
), islands AS (
  SELECT user_id, s, e,
    SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
                          ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
)
SELECT user_id,
       CAST(island AS BIGINT) AS island,
       MIN(s) AS start_ts,
       MAX(e) AS end_ts,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM islands GROUP BY user_id, island
"""


@register("interval_merge_overlaps", _IVM_ORACLE)
def interval_merge_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping per-user intervals via the cumulative-max
    island rule: an interval starts a new island iff its start exceeds
    the running max end of everything before it (ties broken by
    event_id so both engines see the same order).  Two per-user window
    passes share one hash exchange on user_id (same partitionBy), then
    a grouped aggregate emits one row per merged island.

    100 TB: the only shuffle is user_id (reused by both windows + the
    final groupBy under Catalyst's exchange reuse); per-user sort is
    partition-local.  No global order anywhere."""
    tune(spark)
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr(f"INTERVAL {_IVM_EXTENT_S} SECOND")).alias("e"),
    )
    order_w = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_max_e = F.max("e").over(
        order_w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = ev.withColumn(
        "new_island",
        F.when(F.col("s") <= prev_max_e, F.lit(0)).otherwise(F.lit(1)),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(
            order_w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return islands.groupBy("user_id", "island").agg(
        F.min("s").alias("start_ts"),
        F.max("e").alias("end_ts"),
        F.count("*").alias("n_events"),
    )


# --------------------------------------------------------------------------
# snapshot_diff  (table-format change audit: what a lakehouse "diff two
# snapshots" API answers — which keys were added, removed, or changed
# between two dataset versions.  The engine-level shape behind Iceberg/
# Delta incremental consumption and backfill validation.)
# --------------------------------------------------------------------------

_SNAP_V1_END = "1997-06-01"   # v1 = orders strictly before this date
_SNAP_V2_START = "1996-01-01"  # v2 = orders from this date on
_SNAP_MUT_MOD = 13             # overlap keys % 13 == 0 get a v2 update

_SNAPSHOT_DIFF_ORACLE = f"""
WITH v1 AS (
  SELECT o_orderkey AS k, o_totalprice AS price
  FROM orders WHERE o_orderdate < TIMESTAMP '{_SNAP_V1_END} 00:00:00'
), v2 AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % {_SNAP_MUT_MOD} = 0
              THEN o_totalprice + 1 ELSE o_totalprice END AS price
  FROM orders WHERE o_orderdate >= TIMESTAMP '{_SNAP_V2_START} 00:00:00'
)
SELECT COALESCE(v1.k, v2.k) AS o_orderkey,
       CASE WHEN v1.k IS NULL THEN 'added'
            WHEN v2.k IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM v1 FULL JOIN v2 ON v1.k = v2.k
WHERE v1.k IS NULL OR v2.k IS NULL OR v1.price <> v2.price
"""


@register("snapshot_diff", _SNAPSHOT_DIFF_ORACLE)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two deterministic snapshots of the orders table (v1 = an
    older date horizon, v2 = a newer one with a seeded in-place price
    update on the overlap): FULL OUTER join on the key, emit only
    added / removed / changed rows.

    100 TB: one key-partitioned sort-merge join; unchanged rows (the
    overwhelming majority in real snapshots) are filtered before they
    leave the join, so output is bounded by churn, not table size.  On
    a real lakehouse the same plan consumes two snapshot reads of one
    table — manifest pruning cuts the scan to changed files first."""
    tune(spark)
    o = t(spark, sf_dir, "orders")
    v1 = o.filter(
        F.col("o_orderdate") < F.lit(_SNAP_V1_END).cast("timestamp")
    ).select(F.col("o_orderkey").alias("k1"), F.col("o_totalprice").alias("p1"))
    v2 = o.filter(
        F.col("o_orderdate") >= F.lit(_SNAP_V2_START).cast("timestamp")
    ).select(
        F.col("o_orderkey").alias("k2"),
        F.when(
            F.col("o_orderkey") % _SNAP_MUT_MOD == 0,
            F.col("o_totalprice") + 1,
        ).otherwise(F.col("o_totalprice")).alias("p2"),
    )
    joined = v1.join(v2, F.col("k1") == F.col("k2"), "full")
    return joined.filter(
        F.col("k1").isNull() | F.col("k2").isNull() | (F.col("p1") != F.col("p2"))
    ).select(
        F.coalesce("k1", "k2").alias("o_orderkey"),
        F.when(F.col("k1").isNull(), F.lit("added"))
        .when(F.col("k2").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("change"),
    )


# --------------------------------------------------------------------------
# time_travel_read  (manifest-pinned as-of reads over the maintenance
# layer: write -> delete -> compact publish numbered manifests, the
# CURRENT state is hash-certified, and every prior state stays
# readable — the lakehouse completion of the reference's daily rollover
# (es.go:78-116's dated indices are exactly a poor man's manifest log))
# --------------------------------------------------------------------------

_TT_DEL_MOD = 97  # delete keys: doc_id % 97 == 0 (the forget-me set)


def _tt_fixture_dir(sf_dir: str) -> str:
    import hashlib
    import tempfile

    key = hashlib.sha256(
        f"{os.path.abspath(sf_dir)}|vt|{_TT_DEL_MOD}".encode()
    ).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), "gpe_vt", f"tt-{key}")


def _tt_build_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent build of the 3-version dataset: v0 full snapshot,
    v1 targeted delete (doc_id % 97 == 0), v2 compaction.  A _READY
    marker written after v2 makes a crashed half-build self-heal by
    rebuild (versions are immutable, so a finished build never
    changes)."""
    from go_pulsar_elasticsearch_spark import maintenance as mt

    ds = _tt_fixture_dir(sf_dir)
    ready = os.path.join(ds, "_FIXTURE_READY")
    if os.path.exists(ready):
        return ds
    import shutil

    shutil.rmtree(ds, ignore_errors=True)
    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    mt.vt_write(spark, ds, docs, n_files=4)
    forget = [
        r.doc_id
        for r in docs.filter(F.col("doc_id") % _TT_DEL_MOD == 0)
        .select("doc_id")
        .collect()
    ]  # the external right-to-be-forgotten key list; bounded (1/97 of ids)
    mt.vt_delete_keys(spark, ds, "doc_id", forget)
    mt.vt_compact(spark, ds, n_files=2)
    with open(ready, "w") as fh:
        fh.write("ok\n")
    return ds


_TT_ORACLE = f"""
SELECT doc_id, n_chars FROM documents WHERE doc_id % {_TT_DEL_MOD} <> 0
"""


@register("time_travel_read", _TT_ORACLE)
def time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURRENT-state read of a manifest-pinned versioned dataset after
    a write -> delete_keys -> compact history: the certified rows must
    equal the original corpus minus the deleted key set, proving the
    manifest chain (including the carried-by-reference files of the
    delete and the compaction rewrite) resolves to exactly the right
    bytes.  The as-of reads of v0/v1 and the audit log are pinned in
    tests/test_maintenance.py.

    100 TB shape: a manifest read is metadata-sized (one JSON of file
    paths); the data scan is pruned to exactly the pinned files — time
    travel costs nothing at read time beyond pointer resolution, which
    is the entire point of manifest-over-directory layouts (Iceberg/
    Delta do precisely this with more metadata levels)."""
    from go_pulsar_elasticsearch_spark import maintenance as mt

    tune(spark)
    ds = _tt_build_fixture(spark, sf_dir)
    return mt.vt_read(spark, ds).select("doc_id", "n_chars")


# --------------------------------------------------------------------------
# vt_stream_sink_read  (the manifest-pinned STREAMING sink: every
# micro-batch publishes one append manifest — the reference's daily
# rollover (es.go:78-116) completed into a streaming lakehouse table
# with per-epoch time travel and replay-safe appends)
# --------------------------------------------------------------------------

_VTS_ORACLE = """
SELECT event_id, user_id, event_type FROM events
"""


def _vts_drive(spark: SparkSession, sf_dir: str) -> str:
    from go_pulsar_elasticsearch_spark import maintenance as mt
    from go_pulsar_elasticsearch_spark.streaming.drain import (
        drain_file_stream,
        drained,
        id_range_predicates,
    )

    def build() -> str:
        ev = t(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type"
        )
        hi = ev.agg(F.max("event_id")).first()[0] + 1

        def factory(base: str):
            ds = os.path.join(base, "table")

            def body(batch_df, epoch_id: int) -> None:
                mt.vt_stream_epoch_append(
                    batch_df.sparkSession, ds, batch_df, epoch_id
                )

            return body

        base = drain_file_stream(
            spark,
            ev,
            "event_id long, user_id long, event_type string",
            id_range_predicates(
                F.col("event_id"),
                ((0, hi // 5), (hi // 5, hi // 2), (hi // 2, hi)),
            ),
            factory,
            "gpe-vtstream-",
        )
        return os.path.join(base, "table")

    return drained(("vt_stream", sf_dir), build)


@register("vt_stream_sink_read", _VTS_ORACLE)
def vt_stream_sink_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURRENT-state read of a table built by the manifest-pinned
    STREAMING sink: the event stream drains in three uneven
    micro-batches, each publishing one append manifest stamped with its
    epoch (vt_stream_epoch_append — a checkpoint replay finds its epoch
    in the log and publishes nothing, so the table can never
    double-append).  The certified rows must equal the full batch
    source — and every intermediate version stays readable as-of its
    manifest, which is what upgrades the reference's dated-index
    rollover into a real lakehouse table (per-epoch audit + time
    travel; pinned in tests/test_maintenance.py).

    100 TB: each epoch costs one parquet write + one metadata-sized
    manifest publish; readers resolve a pointer and scan exactly the
    pinned files.  This is the Iceberg/Delta streaming-sink commit
    shape reduced to its portable core."""
    from go_pulsar_elasticsearch_spark import maintenance as mt

    tune(spark)
    ds = _vts_drive(spark, sf_dir)
    return mt.vt_read(spark, ds)


# --------------------------------------------------------------------------
# duplicate_invoice_detect  (structured near-duplicate detection: same
# customer, amounts within ±10%, order dates within a 7-day window,
# different keys — the billing-dedup complement to the text-dedup
# family; the blocking key makes it a bounded self-join, not all-pairs)
# --------------------------------------------------------------------------

_DUPINV_WINDOW_DAYS = 7
_DUPINV_AMOUNT_TOL = 0.10  # relative amount tolerance

_DUPINV_ORACLE = f"""
SELECT a.o_orderkey AS orderkey_a,
       b.o_orderkey AS orderkey_b,
       a.o_custkey AS custkey,
       a.o_totalprice AS amount_a,
       b.o_totalprice AS amount_b,
       CAST(date_diff('day', CAST(a.o_orderdate AS DATE),
                      CAST(b.o_orderdate AS DATE)) AS BIGINT) AS day_gap
FROM orders a
JOIN orders b
  ON b.o_custkey = a.o_custkey
 AND b.o_orderkey > a.o_orderkey
 AND b.o_orderdate >= a.o_orderdate
 AND b.o_orderdate <= a.o_orderdate + INTERVAL {_DUPINV_WINDOW_DAYS} DAY
 AND abs(b.o_totalprice - a.o_totalprice)
     <= {_DUPINV_AMOUNT_TOL} * a.o_totalprice
"""


@register("duplicate_invoice_detect", _DUPINV_ORACLE)
def duplicate_invoice_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suspected double-billing pairs: same customer, order dates
    within a 7-day window, amounts within ±10% — the structured twin of
    the text near-dup ops (exact BLOCKING key + cheap residual verify,
    the shape every entity-resolution pipeline runs).

    The equi block is custkey (co-partitioned self-join, never
    all-pairs; per-customer order counts bound the fan-out — real
    billing data would add an amount bucket to the block, the fixture's
    continuous prices make custkey the selective key).  The date window
    and relative-amount tolerance are residual predicates inside the
    join; both engines evaluate the identical IEEE expressions, so even
    the float tolerance boundary hash-matches."""
    tune(spark)
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    a, b = o.alias("a"), o.alias("b")
    upper = F.col("a.o_orderdate") + F.expr(
        f"INTERVAL {_DUPINV_WINDOW_DAYS} DAY"
    )
    close = (
        F.abs(F.col("b.o_totalprice") - F.col("a.o_totalprice"))
        <= F.lit(_DUPINV_AMOUNT_TOL) * F.col("a.o_totalprice")
    )
    pairs = a.join(
        b,
        (F.col("b.o_custkey") == F.col("a.o_custkey"))
        & (F.col("b.o_orderkey") > F.col("a.o_orderkey"))
        & (F.col("b.o_orderdate") >= F.col("a.o_orderdate"))
        & (F.col("b.o_orderdate") <= upper)
        & close,
    )
    return pairs.select(
        F.col("a.o_orderkey").alias("orderkey_a"),
        F.col("b.o_orderkey").alias("orderkey_b"),
        F.col("a.o_custkey").alias("custkey"),
        F.col("a.o_totalprice").alias("amount_a"),
        F.col("b.o_totalprice").alias("amount_b"),
        F.datediff(
            F.col("b.o_orderdate").cast("date"),
            F.col("a.o_orderdate").cast("date"),
        ).cast("bigint").alias("day_gap"),
    )
