"""Elasticsearch aggregation parity: top_hits, multi_terms, matrix_stats,
terms_set.

The reference's whole purpose is to land records in Elasticsearch so they
can be aggregated there (pkg/es/es.go:160-213 bulk-indexes; the dated
`events-YYYY.MM.DD` layout in es.go:102-116 exists for exactly these
dashboard aggs).  These four close the remaining ES-agg surface the
engine had not yet named:

  top_hits_agg     — ES `terms` + `top_hits` sub-aggregation: for every
                     bucket, the top-k documents by a sort key.
  multi_terms_agg  — ES `multi_terms`: buckets keyed by a field TUPLE,
                     ordered by doc_count, size-capped.
  matrix_stats_agg — ES `matrix_stats`: per-field mean/variance/skewness
                     plus the full covariance / correlation matrix.
  terms_set_match  — ES `terms_set` query: documents matching at least
                     `minimum_should_match` terms of a set.

100 TB posture: top_hits is ONE shuffle on the bucket key (row_number +
count share the same window partition, so Catalyst plans a single
exchange) and emits k rows per bucket, never the bucket contents.
multi_terms is a map-side-combined aggregate whose output is
vocabulary-sized, then a global top-k (TakeOrderedAndProject — no full
sort).  matrix_stats is a SINGLE full-scan aggregate producing one
moments row; the matrix is assembled driver-free from that 1-row frame
(field-count^2 rows total).  terms_set is a zero-shuffle narrow scan.

Cross-engine exactness: matrix_stats uses the exact-decimal-moment
carriers from functions.exact (order-independent sums), and the one
statistic whose moment exceeds the 2^53 decimal->double window
(skewness' third moment of l_extendedprice, ~6e20) is rounded to 6
decimals on both engines; m2^1.5 is written `m2 * sqrt(m2)` because
IEEE sqrt is correctly rounded everywhere while libm pow is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.functions.caching import checkpoint_slot
from go_pulsar_elasticsearch_spark.functions.exact import SUMD, dsum
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# top_hits_agg  (ES terms + top_hits sub-aggregation)
# --------------------------------------------------------------------------

_TOP_HITS_K = 3

_TOP_HITS_ORACLE = f"""
SELECT source,
       CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS doc_count,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY source ORDER BY n_chars DESC, doc_id) AS INTEGER)
         AS hit_rank,
       doc_id,
       n_chars
FROM documents
QUALIFY hit_rank <= {_TOP_HITS_K}
"""


@register("top_hits_agg", _TOP_HITS_ORACLE)
def top_hits_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``terms`` buckets over ``source`` with a ``top_hits`` sub-agg:
    each bucket's doc_count plus its top-3 documents by ``n_chars``
    (doc_id ascending as the deterministic tiebreak, the ES `_doc`
    analog).  ``row_number`` and the bucket ``count`` share one window
    partition, so the plan carries a SINGLE hash exchange on ``source``
    and emits k rows per bucket — bucket contents never leave their
    executor un-ranked."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    wc = Window.partitionBy("source")
    return (
        docs.select(
            "source",
            F.count("*").over(wc).alias("doc_count"),
            F.row_number().over(w).alias("hit_rank"),
            "doc_id",
            "n_chars",
        )
        .filter(F.col("hit_rank") <= _TOP_HITS_K)
    )


# --------------------------------------------------------------------------
# multi_terms_agg  (ES multi_terms — composite-keyed buckets, size-capped)
# --------------------------------------------------------------------------

_MULTI_TERMS_SIZE = 10

_MULTI_TERMS_ORACLE = f"""
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS doc_count,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY lang, source
ORDER BY doc_count DESC, lang, source
LIMIT {_MULTI_TERMS_SIZE}
"""


@register("multi_terms_agg", _MULTI_TERMS_ORACLE)
def multi_terms_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``multi_terms``: buckets keyed by the (lang, source) tuple with
    doc_count ordering and the standard ``size`` cap (10), plus a
    sum metric per bucket.  The aggregate map-side combines to a
    vocabulary-sized frame; the cap is orderBy().limit() which Catalyst
    executes as TakeOrderedAndProject — no global sort at any scale.
    The (doc_count DESC, lang, source) order is total, so the selected
    SET is deterministic (the hash compare is order-insensitive)."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count("*").alias("doc_count"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy(F.desc("doc_count"), "lang", "source")
        .limit(_MULTI_TERMS_SIZE)
    )


# --------------------------------------------------------------------------
# matrix_stats_agg  (ES matrix_stats — moments + covariance/correlation)
# --------------------------------------------------------------------------

# Exact decimal moment carriers per field (see functions/exact.py for the
# order-independence argument).  Scales chosen from value magnitudes at
# sf0.1 (lineitem ~600k rows):
#   l_quantity      q <= 50        S(q) scale 1, S(q^2) <= 1.5e9 scale 1,
#                                  S(q^3) <= 7.5e10 scale 1 (long path)
#   l_extendedprice p <= ~1.1e5    S(p) scale 2; S(p^2) ~ 2.2e15 -> wide
#                                  decimal, out_scale 0 (the agg_stats
#                                  pattern, unscaled < 2^53: exact);
#                                  S(p^3) ~ 6e20 -> DECIMAL(38,1), beyond
#                                  the 2^53 window, so skewness (its only
#                                  consumer) is rounded to 6 decimals
#   l_discount      d <= 0.11, 2dp S(d) scale 2; S(d^2) scale 4;
#                                  S(d^3) scale 6 (wide path, tiny sums)
#   cross products  pq scale 2, pd scale 4, qd scale 4

_MS_MOMENTS_SQL = f"""
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {SUMD('l_quantity', 1)} AS sq,
         {SUMD('l_quantity * l_quantity', 1)} AS sqq,
         {SUMD('l_quantity * l_quantity * l_quantity', 1)} AS sq3,
         {SUMD('l_extendedprice', 2)} AS sp,
         {SUMD('l_extendedprice * l_extendedprice', 4, 18, 0)} AS spp,
         {SUMD('l_extendedprice * l_extendedprice * l_extendedprice',
               1, 38, 0)} AS sp3,
         {SUMD('l_discount', 2)} AS sd,
         {SUMD('l_discount * l_discount', 4, 18, 4)} AS sdd,
         {SUMD('l_discount * l_discount * l_discount', 6, 18, 6)} AS sd3,
         {SUMD('l_extendedprice * l_quantity', 2)} AS spq,
         {SUMD('l_extendedprice * l_discount', 4)} AS spd,
         {SUMD('l_quantity * l_discount', 4)} AS sqd
  FROM lineitem
"""


def _ms_row_sql(fa: str, fb: str, sa: str, saa: str, sa3: str,
                sb: str, sbb: str, sab: str) -> str:
    mean_a = f"({sa} / n)"
    mean_b = f"({sb} / n)"
    ca = f"({saa} - {sa} * {sa} / n)"   # centered sum of squares of a
    cb = f"({sbb} - {sb} * {sb} / n)"
    cab = f"({sab} - {sa} * {sb} / n)"
    m2 = f"({saa} / n - {mean_a} * {mean_a})"
    m3 = (f"({sa3} / n - 3 * {mean_a} * ({saa} / n)"
          f" + 2 * {mean_a} * {mean_a} * {mean_a})")
    if fa == fb:
        cov = f"({ca} / (n - 1))"
        corr = "CAST(1.0 AS DOUBLE)"
    else:
        cov = f"({cab} / (n - 1))"
        corr = f"({cab} / sqrt({ca} * {cb}))"
    return (
        f"SELECT '{fa}' AS field_a, '{fb}' AS field_b, n,"
        f" {mean_a} AS mean_a, {mean_b} AS mean_b,"
        f" ({ca} / (n - 1)) AS variance_a,"
        f" {cov} AS covariance, {corr} AS correlation,"
        f" ROUND({m3} / ({m2} * sqrt({m2})), 6) AS skew_a"
        f" FROM m"
    )


# alphabetical field order; pairs with field_a <= field_b
_MS_FIELDS = {
    "l_discount": ("sd", "sdd", "sd3"),
    "l_extendedprice": ("sp", "spp", "sp3"),
    "l_quantity": ("sq", "sqq", "sq3"),
}
_MS_CROSS = {
    ("l_discount", "l_extendedprice"): "spd",
    ("l_discount", "l_quantity"): "sqd",
    ("l_extendedprice", "l_quantity"): "spq",
}

_MATRIX_STATS_ORACLE = "WITH m AS (" + _MS_MOMENTS_SQL + ")\n" + "\nUNION ALL\n".join(
    _ms_row_sql(
        fa, fb, *_MS_FIELDS[fa],
        _MS_FIELDS[fb][0], _MS_FIELDS[fb][1],
        _MS_FIELDS[fa][1] if fa == fb else _MS_CROSS[(fa, fb)],
    )
    for fa in sorted(_MS_FIELDS)
    for fb in sorted(_MS_FIELDS)
    if fa <= fb
)


@register("matrix_stats_agg", _MATRIX_STATS_ORACLE)
def matrix_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``matrix_stats`` over (l_quantity, l_extendedprice, l_discount):
    one row per ordered field pair carrying n, means, sample variance,
    sample covariance, correlation, and population skewness of field_a.

    Plan shape: ONE full-scan aggregate produces a single moments row
    (exact decimal sums — order-independent, so bit-identical to the
    oracle's scan-order sums); the 6 matrix rows are then assembled from
    that slot-cached 1-row frame with no further scan or shuffle.  At
    100 TB the scan is the whole cost and it is one pass, map-side
    combined; ES itself computes the same running moments per shard and
    merges them.  Skewness is the one value whose third moment
    (sum(price^3) ~ 6e20) exceeds the window where DuckDB's
    decimal->double cast is correctly rounded, so it is rounded to 6
    decimals on both engines; every other statistic is bit-exact with
    no rounding (sqrt is IEEE-correctly-rounded, and m2^1.5 is written
    m2 * sqrt(m2) to avoid libm pow)."""
    tune(spark)
    li = t(spark, sf_dir, "lineitem")
    q, p, d = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    m = checkpoint_slot(
        "matrix_stats_moments",
        li.agg(
            F.count("*").alias("n"),
            dsum(q, 1).alias("sq"),
            dsum(q * q, 1).alias("sqq"),
            dsum(q * q * q, 1).alias("sq3"),
            dsum(p, 2).alias("sp"),
            dsum(p * p, 4, 18, 0, wide=True).alias("spp"),
            dsum(p * p * p, 1, 38, 0, wide=True).alias("sp3"),
            dsum(d, 2).alias("sd"),
            dsum(d * d, 4, 18, 4).alias("sdd"),
            dsum(d * d * d, 6, 18, 6).alias("sd3"),
            dsum(p * q, 2).alias("spq"),
            dsum(p * d, 4).alias("spd"),
            dsum(q * d, 4).alias("sqd"),
        ),
    )

    def row(fa: str, fb: str) -> DataFrame:
        sa, saa, sa3 = (F.col(c) for c in _MS_FIELDS[fa])
        sb, sbb, _ = (F.col(c) for c in _MS_FIELDS[fb])
        sab = (
            F.col(_MS_FIELDS[fa][1]) if fa == fb
            else F.col(_MS_CROSS[(fa, fb)])
        )
        n = F.col("n")
        mean_a, mean_b = sa / n, sb / n
        ca = saa - sa * sa / n
        cb = sbb - sb * sb / n
        cab = sab - sa * sb / n
        m2 = saa / n - mean_a * mean_a
        m3 = sa3 / n - 3 * mean_a * (saa / n) + 2 * mean_a * mean_a * mean_a
        cov = (ca if fa == fb else cab) / (n - 1)
        corr = (
            F.lit(1.0) if fa == fb else cab / F.sqrt(ca * cb)
        )
        return m.select(
            F.lit(fa).alias("field_a"),
            F.lit(fb).alias("field_b"),
            "n",
            mean_a.alias("mean_a"),
            mean_b.alias("mean_b"),
            (ca / (n - 1)).alias("variance_a"),
            cov.alias("covariance"),
            corr.alias("correlation"),
            F.round(m3 / (m2 * F.sqrt(m2)), 6).alias("skew_a"),
        )

    out = None
    for fa in sorted(_MS_FIELDS):
        for fb in sorted(_MS_FIELDS):
            if fa <= fb:
                r = row(fa, fb)
                out = r if out is None else out.unionAll(r)
    return out


# --------------------------------------------------------------------------
# terms_set_match  (ES terms_set query — minimum_should_match over a set)
# --------------------------------------------------------------------------

_TERMS_SET = ("spark", "join", "window")
_TERMS_MIN_MATCH = 2

_TERMS_SET_ORACLE = f"""
SELECT doc_id,
       CAST(len(list_intersect(
         list_distinct(list_filter(string_split(text, ' '), x -> x <> '')),
         {list(_TERMS_SET)})) AS INTEGER) AS n_matched
FROM documents
WHERE len(list_intersect(
        list_distinct(list_filter(string_split(text, ' '), x -> x <> '')),
        {list(_TERMS_SET)})) >= {_TERMS_MIN_MATCH}
"""


@register("terms_set_match", _TERMS_SET_ORACLE)
def terms_set_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``terms_set`` query: documents whose text contains at least 2 of
    the 3-term set, with the matched-term count.  A zero-shuffle narrow
    scan — the set membership is a per-row array intersection inside
    whole-stage codegen, and the term set is a literal (at real scale, a
    broadcast).  ES evaluates the same predicate per shard with a
    CoveringQuery; over columnar storage the scan IS the index."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    matched = F.size(
        F.array_intersect(
            F.array_distinct(F.expr("filter(split(text, ' '), x -> x != '')")),
            F.array(*[F.lit(w) for w in _TERMS_SET]),
        )
    )
    return (
        docs.select("doc_id", matched.alias("n_matched"))
        .filter(F.col("n_matched") >= _TERMS_MIN_MATCH)
    )
