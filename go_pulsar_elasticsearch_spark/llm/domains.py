"""Domain-level corpus curation: per-source caps and quota sampling.

Real crawls are dominated by a handful of over-represented domains, and
the standard curation response is (a) keep only the best K documents per
domain, or (b) downsample each domain to a target quota.  Both are here
as certified operators over the `documents` table's `source` column
(the fixture's stand-in for registrable domain), complementing
`mixture_weights_temperature` (llm/sampling.py), which computes the
epoch-level sampling weights from the same per-source distribution.

Scale shapes:
- `domain_caps` is a per-domain top-K: one shuffle on `source`, then a
  bounded rank inside each domain.  A mega-domain serializes its own
  partition — `domain_caps_twophase` is the 100 TB-safe plan (salted
  local top-K, then a cap-bounded re-rank), hash-certified against the
  SAME oracle; at the fixture's domain cardinality the plain window is
  the right plan, and AQE's skew handling covers moderate imbalance.
- `per_domain_quota_sample` never sorts: pass 1 collapses the corpus to
  |domains| counts, pass 2 broadcasts those counts back and keeps a doc
  iff md5-bucket(doc_id) clears the domain's integer acceptance
  threshold — deterministic (re-runs and late-arriving replicas agree),
  no RNG, no per-domain state beyond one int.  This is the same
  hash-bucket idiom as corpus.py's split/shard operators (two md5 hex
  digits -> 0..255, identical in Spark `instr` / DuckDB `strpos`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.llm.corpus import _MD5_BUCKET_SQL, _md5_bucket
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# --------------------------------------------------------------------------
# domain_caps
# --------------------------------------------------------------------------

_CAP_K = 15  # bites at sf0.01+ (25 docs/source in the fixture)

_CAPS_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
         ) AS rank_in_source
  FROM documents
)
SELECT doc_id, source, n_chars, CAST(rank_in_source AS BIGINT) AS rank_in_source
FROM ranked WHERE rank_in_source <= {_CAP_K}
"""


@register("domain_caps", _CAPS_ORACLE)
def domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the top K=15 documents per source, best-first by length with
    doc_id as the total-order tie-break (a real pipeline ranks by a
    quality score — `dedup_keep_best` in llm/quality.py certifies that
    composition; this operator certifies the cap itself).

    One shuffle (hash on source), bounded per-domain rank — never a
    global sort.  See the module docstring for the mega-domain caveat
    and its two-phase mitigation."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("rank_in_source", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank_in_source") <= _CAP_K)
    )


# --------------------------------------------------------------------------
# domain_caps_twophase  (the mega-domain-safe plan, same certified output)
# --------------------------------------------------------------------------

_CAP_SALTS = 16


@register("domain_caps_twophase", _CAPS_ORACLE)
def domain_caps_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTICAL output to domain_caps (same oracle, hash-certified),
    via the plan that survives a mega-domain: salted two-phase top-K.

    Phase 1 ranks within (source, salt) — salt = md5-bucket(doc_id) %
    16, deterministic, not layout-dependent — so a domain holding half
    the corpus is spread over 16 reducers instead of melting one; each
    (source, salt) group keeps its local top-K, a lossless superset of
    the global top-K (any row in the global top-K is in its own salt's
    top-K).  Phase 2 re-ranks the survivors per source: <= K*16 rows
    per domain regardless of domain size — the second window's input is
    CAP-bounded, data-size-independent.  At 100 TB the salt count
    scales with the biggest domain's row count / executor memory;
    correctness never depends on it."""
    tune(spark)
    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    salt = _md5_bucket("doc_id") % _CAP_SALTS
    w1 = Window.partitionBy("source", "_salt").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    local = (
        docs.withColumn("_salt", salt)
        .withColumn("_lrk", F.row_number().over(w1))
        .filter(F.col("_lrk") <= _CAP_K)
    )
    w2 = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        local.withColumn("rank_in_source", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rank_in_source") <= _CAP_K)
        .select("doc_id", "source", "n_chars", "rank_in_source")
    )


# --------------------------------------------------------------------------
# per_domain_quota_sample
# --------------------------------------------------------------------------

_QUOTA = 18  # target docs per source; sources under quota keep everything

_QUOTA_ORACLE = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n FROM documents GROUP BY source
), thresh AS (
  -- integer acceptance threshold on the 0..255 bucket: floor(256*q/n),
  -- clamped at 256 (domains under quota keep everything).  Pure integer
  -- arithmetic -> bit-identical across engines.
  SELECT source, n,
         CASE WHEN n <= {_QUOTA} THEN 256
              ELSE CAST(floor(256.0 * {_QUOTA} / n) AS BIGINT) END AS keep_lt
  FROM counts
)
SELECT d.doc_id, d.source, t.keep_lt
FROM documents d JOIN thresh t ON d.source = t.source
WHERE {_MD5_BUCKET_SQL("d.doc_id")} < t.keep_lt
"""


@register("per_domain_quota_sample", _QUOTA_ORACLE)
def per_domain_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample every over-represented source toward a fixed quota by
    deterministic hash acceptance: keep a doc iff its md5 bucket
    (0..255 from doc_id) is below floor(256*quota/n_source).  In
    expectation each domain lands at ~quota docs, with zero RNG state —
    replaying the pipeline, or sampling a late-arriving shard of the
    same domain, reproduces the identical keep set.

    Two passes, no sort anywhere: the counts agg collapses the corpus
    to |domains| rows (map-side combined), which then BROADCAST back
    onto the scan — the only data-sized work is one filtered pass.  At
    100 TB the counts frame is domain-cardinality (millions of rows at
    web scale, still broadcastable at ~tens of MB; a sort-merge join on
    source is the fallback AQE picks if not)."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n"))
    thresh = counts.select(
        "source",
        F.when(F.col("n") <= _QUOTA, F.lit(256).cast("bigint")).otherwise(
            F.floor(F.lit(256.0 * _QUOTA) / F.col("n")).cast("bigint")
        ).alias("keep_lt"),
    )
    return (
        docs.select("doc_id", "source")
        .join(F.broadcast(thresh), "source")
        .filter(_md5_bucket("doc_id") < F.col("keep_lt"))
        .select("doc_id", "source", "keep_lt")
    )


# --------------------------------------------------------------------------
# data_recipe_epochs  (training-mixture sizing: epochs per domain under
# a token budget with alpha-smoothed weights and an epoch cap)
# --------------------------------------------------------------------------

_RECIPE_ALPHA_NOTE = "alpha = 0.5 (sqrt smoothing, the exactly-computable tier)"
_RECIPE_BUDGET_X = 2.0  # train budget = 2x the corpus token count
_RECIPE_EPOCH_CAP = 4.0  # no domain repeats more than 4 epochs

_DATA_RECIPE_ORACLE = """
WITH dom AS (
  SELECT source,
         CAST(SUM(len(list_filter(string_split(text, ' '),
                                  x -> x <> ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), sm AS (
  SELECT source, n_tokens, round(sqrt(CAST(n_tokens AS DOUBLE)), 6) AS s
  FROM dom
), tot AS (
  SELECT CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DOUBLE) AS s_tot,
         CAST(SUM(n_tokens) AS BIGINT) AS tok_tot
  FROM sm
)
SELECT source, n_tokens,
       s / s_tot AS weight,
       least(4.0, (2.0 * tok_tot) * (s / s_tot) / n_tokens) AS epochs,
       least(4.0, (2.0 * tok_tot) * (s / s_tot) / n_tokens) * n_tokens
         AS alloc_tokens
FROM sm CROSS JOIN tot
"""


@register("data_recipe_epochs", _DATA_RECIPE_ORACLE)
def data_recipe_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data recipe sizing — the calculation a pipeline runs
    before launching a mixture job: per domain, token counts, an
    alpha=0.5-smoothed sampling weight (sqrt flattens the head domain,
    the UniMax/DoReMi-family heuristic in its exactly-computable tier),
    and the resulting epoch count under a fixed train budget (2x the
    corpus) with a 4-epoch repetition cap — the "how many times may a
    small domain repeat" knob from the data-constrained-scaling
    literature.

    Cross-engine exactness: token counts are exact bigints; sqrt is a
    correctly-rounded op on the same double; the weight denominator
    sums round(sqrt, 6) as DECIMAL so partition merge order cannot
    perturb it; everything after is one shared IEEE expression.  One
    scan, one bucket aggregate, a 1-row total broadcast back — output
    is domain-count rows."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    dom = docs.groupBy("source").agg(
        F.sum(
            F.size(F.filter(F.split("text", " "), lambda x: x != ""))
        ).cast("bigint").alias("n_tokens")
    )
    sm = dom.select(
        "source",
        "n_tokens",
        F.round(F.sqrt(F.col("n_tokens").cast("double")), 6).alias("s"),
    )
    tot = sm.agg(
        F.sum(F.col("s").cast("decimal(18,6)")).cast("double").alias("s_tot"),
        F.sum("n_tokens").cast("bigint").alias("tok_tot"),
    )
    w = F.col("s") / F.col("s_tot")
    epochs = F.least(
        F.lit(_RECIPE_EPOCH_CAP),
        (F.lit(_RECIPE_BUDGET_X) * F.col("tok_tot")) * w / F.col("n_tokens"),
    )
    return sm.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        w.alias("weight"),
        epochs.alias("epochs"),
        (epochs * F.col("n_tokens")).alias("alloc_tokens"),
    )
