"""URL canonicalization + canonical-URL dedup over the crawl surface
(round-5 VERDICT #3): the FIRST pass of every web-corpus pipeline —
cheaper than any content hash — normalizes the `warc_ingest`-shaped
URI and keeps one best record per canonical URL.

Canonicalization rules (each one a JVM-side regexp_replace; no UDFs):

1. strip the fragment (`#...` never reaches the server);
2. lowercase the scheme://authority part (host names are
   case-insensitive; paths are NOT touched);
3. drop a leading `www.`;
4. drop default ports (`:443` on https, `:80` on http);
5. remove tracking query params (utm_*, gclid, fbclid, ref) — matches
   are ANCHORED on their [?&] separator so `ref=` can never fire
   inside `href=`, and runs of adjacent tracking params clear in one
   match (a global replace never rescans its own output);
6. strip trailing slashes at the path/query boundary and the path end
   only (a `/?` inside a query VALUE is data, not structure).

The same chain is expressed in the DuckDB oracle — semantically, not
textually: DuckDB regexp_replace is FIRST-match unless passed the 'g'
flag and RE2 has no lookahead, so patterns here avoid lookahead and the
oracle passes 'g' exactly where Spark's always-global replace needs
mirroring.

The certified queries mangle each document's URL deterministically —
three docs share one base URL through three different corruptions
(upper-cased www+port+tracking-params+trailing-slash; default
port+gclid+fragment; already-canonical) — so `url_canonical_dedup`'s
collapse is REAL (n_variants up to 3 per canonical URL), not a no-op
over already-unique fixtures.

100 TB posture: canonicalization is a stateless row-map fused into the
scan; the dedup is ONE hash aggregate on the canonical string with
map-side partials — uniform keys (URL space), no window, no join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

_TRACKING = r"(utm_[A-Za-z]+|gclid|fbclid|ref)"


def canonicalize_url(url: Column) -> Column:
    """The rule chain above as one composed Column expression."""
    u = F.regexp_replace(url, r"#.*$", "")  # 1 fragment
    # 2 lowercase scheme://authority only
    auth = F.regexp_extract(u, r"^([^/?#]*//[^/?#]*)", 1)
    rest = F.regexp_replace(u, r"^[^/?#]*//[^/?#]*", "")
    u = F.concat(F.lower(auth), rest)
    u = F.regexp_replace(u, r"^(https?://)www\.", r"$1")  # 3 www
    # 4 default ports (no lookahead: capture end-or-path and re-emit)
    u = F.regexp_replace(u, r"^(https://[^/:?#]*):443($|[/?].*)", r"$1$2")
    u = F.regexp_replace(u, r"^(http://[^/:?#]*):80($|[/?].*)", r"$1$2")
    # 5 tracking params: anchored on the [?&] separator (an unanchored
    # pattern would match 'ref=' inside 'href=' and corrupt real
    # params), with a (?:...)+ run so ADJACENT tracking params clear in
    # one match (a global replace never rescans its own output, so
    # back-to-back params would otherwise survive alternately); then
    # the query-final param, then a query emptied entirely
    u = F.regexp_replace(
        u, r"([?&])(?:" + _TRACKING + r"=[^&#]*&)+", r"$1"
    )
    u = F.regexp_replace(u, r"[?&]" + _TRACKING + r"=[^&#]*$", "")
    u = F.regexp_replace(u, r"\?$", "")
    # 6 trailing slashes: only at the path/query boundary (lazy [^?]*?
    # guarantees the FIRST '?', so a '/?' inside a query value is never
    # touched — and the match is single+anchored in both engines)
    u = F.regexp_replace(u, r"^([^?]*?)/+\?", r"$1?")
    u = F.regexp_replace(u, r"^([^?]*?)/+$", r"$1")
    return u


# the SAME chain in DuckDB ('g' where Spark's always-global matters;
# \1 backrefs instead of $1); {U} is the fragment-stripped input
_CANON_SQL = r"""
regexp_replace(regexp_replace(regexp_replace(regexp_replace(
regexp_replace(regexp_replace(regexp_replace(regexp_replace(
  lower(regexp_extract({U}, '^([^/?#]*//[^/?#]*)', 1))
    || regexp_replace({U}, '^[^/?#]*//[^/?#]*', ''),
  '^(https?://)www\.', '\1'),
  '^(https://[^/:?#]*):443($|[/?].*)', '\1\2'),
  '^(http://[^/:?#]*):80($|[/?].*)', '\1\2'),
  '([?&])(?:(utm_[A-Za-z]+|gclid|fbclid|ref)=[^&#]*&)+', '\1', 'g'),
  '[?&](utm_[A-Za-z]+|gclid|fbclid|ref)=[^&#]*$', ''),
  '\?$', ''),
  '^([^?]*?)/+\?', '\1?'),
  '^([^?]*?)/+$', '\1')
"""

_FRAG_STRIPPED = "regexp_replace(raw_url, '#.*$', '')"


def _canon_sql(u_expr: str) -> str:
    return _CANON_SQL.replace("{U}", u_expr).strip()


# deterministic adversarial mangles: three docs share one base URL
_VARIANT_SPARK = None  # built in _mangled() below

_VARIANT_SQL = """
CASE CAST(doc_id % 3 AS INTEGER)
  WHEN 0 THEN 'https://corpus.local/d/' || CAST(doc_id // 3 AS VARCHAR)
  WHEN 1 THEN 'HTTPS://WWW.Corpus.LOCAL:443/d/' || CAST(doc_id // 3 AS VARCHAR)
              || '/?utm_source=feed&utm_campaign=x'
  ELSE 'https://corpus.local:443/d/' || CAST(doc_id // 3 AS VARCHAR)
              || '?gclid=abc#frag'
END
"""


def _mangled(docs: DataFrame) -> DataFrame:
    base = F.floor(F.col("doc_id") / 3).cast("long").cast("string")
    raw = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("https://corpus.local/d/"), base),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit("HTTPS://WWW.Corpus.LOCAL:443/d/"),
                base,
                F.lit("/?utm_source=feed&utm_campaign=x"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://corpus.local:443/d/"),
                base,
                F.lit("?gclid=abc#frag"),
            )
        )
    )
    return docs.select("doc_id", "n_chars", raw.alias("raw_url"))


_CANONICALIZE_ORACLE = f"""
WITH mangled AS (
  SELECT doc_id, n_chars, {_VARIANT_SQL} AS raw_url FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       raw_url,
       {_canon_sql(_FRAG_STRIPPED)} AS canonical_url
FROM mangled
"""


@register("url_canonicalize", _CANONICALIZE_ORACLE)
def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, raw_url, canonical_url) — every rule certified row-by-
    row against the DuckDB twin of the regex chain."""
    tune(spark)
    m = _mangled(t(spark, sf_dir, "documents"))
    return m.select(
        "doc_id",
        "raw_url",
        canonicalize_url(F.col("raw_url")).alias("canonical_url"),
    )


_DEDUP_ORACLE = f"""
WITH mangled AS (
  SELECT doc_id, n_chars, {_VARIANT_SQL} AS raw_url FROM documents
), canon AS (
  SELECT doc_id, n_chars,
         {_canon_sql(_FRAG_STRIPPED)} AS canonical_url
  FROM mangled
)
SELECT canonical_url,
       CAST(MIN(doc_id) AS BIGINT) AS kept_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_variants,
       CAST(MAX(n_chars) AS BIGINT) AS best_n_chars
FROM canon GROUP BY canonical_url
"""


@register("url_canonical_dedup", _DEDUP_ORACLE)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best per canonical URL: one hash aggregate over the
    canonical string (min doc_id as the kept representative, max
    n_chars as the 'best' fetch — the longest capture wins, the usual
    crawl heuristic).  Collapses the three deterministic mangles of
    each base URL into one row."""
    tune(spark)
    m = _mangled(t(spark, sf_dir, "documents"))
    return (
        m.select(
            "doc_id",
            "n_chars",
            canonicalize_url(F.col("raw_url")).alias("canonical_url"),
        )
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("kept_doc_id"),
            F.count("*").alias("n_variants"),
            F.max("n_chars").alias("best_n_chars"),
        )
    )


# --------------------------------------------------------------------------
# url_host_profile  (host-level crawl accounting: the other half of
# URL-level dedup — per-host volume, duplication pressure, and fetch
# quality drive crawl scheduling and host-level quota decisions)
# --------------------------------------------------------------------------

# host variants: 5 hosts, each doc's URL mangled like the dedup fixture
_HOST_VARIANT_SQL = """
CASE CAST(doc_id % 3 AS INTEGER)
  WHEN 0 THEN 'https://h' || CAST(doc_id % 5 AS VARCHAR)
              || '.example.org/d/' || CAST(doc_id // 15 AS VARCHAR)
  WHEN 1 THEN 'HTTPS://WWW.H' || CAST(doc_id % 5 AS VARCHAR)
              || '.Example.ORG:443/d/' || CAST(doc_id // 15 AS VARCHAR)
              || '/?utm_source=feed'
  ELSE 'https://h' || CAST(doc_id % 5 AS VARCHAR)
              || '.example.org:443/d/' || CAST(doc_id // 15 AS VARCHAR)
              || '?gclid=abc#frag'
END
"""


def _host_mangled(docs: DataFrame) -> DataFrame:
    host = F.concat(
        F.lit("h"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".example.org"),
    )
    base = F.floor(F.col("doc_id") / 15).cast("long").cast("string")
    raw = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("https://"), host, F.lit("/d/"), base),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit("HTTPS://WWW.H"),
                (F.col("doc_id") % 5).cast("string"),
                F.lit(".Example.ORG:443/d/"),
                base,
                F.lit("/?utm_source=feed"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://"), host, F.lit(":443/d/"), base,
                F.lit("?gclid=abc#frag"),
            )
        )
    )
    return docs.select("doc_id", "n_chars", raw.alias("raw_url"))


_HOST_PROFILE_ORACLE = f"""
WITH mangled AS (
  SELECT doc_id, n_chars, {_HOST_VARIANT_SQL} AS raw_url FROM documents
), canon AS (
  SELECT doc_id, n_chars,
         {{CANON}} AS canonical_url
  FROM mangled
), hosted AS (
  SELECT doc_id, n_chars, canonical_url,
         regexp_extract(canonical_url, '^[a-z]+://([^/:?#]*)', 1) AS host
  FROM canon
)
SELECT host,
       CAST(COUNT(*) AS BIGINT) AS n_fetches,
       CAST(COUNT(DISTINCT canonical_url) AS BIGINT) AS n_pages,
       CAST(COUNT(*) - COUNT(DISTINCT canonical_url) AS BIGINT)
         AS n_dup_fetches,
       CAST(COUNT(*) - COUNT(DISTINCT canonical_url) AS DOUBLE) / COUNT(*)
         AS dup_fetch_ratio,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM hosted GROUP BY host
""".replace("{CANON}", _canon_sql(_FRAG_STRIPPED))


@register("url_host_profile", _HOST_PROFILE_ORACLE)
def url_host_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-HOST crawl accounting over canonicalized URLs: fetch volume,
    distinct pages, duplicate-fetch pressure, and byte totals — the
    numbers a crawl scheduler budgets politeness and recrawl quotas
    with.  One row-map (canonicalize + host extract) fused into the
    scan, then ONE aggregate keyed by host (host cardinality, not
    corpus size, bounds the output at any scale)."""
    tune(spark)
    m = _host_mangled(t(spark, sf_dir, "documents"))
    hosted = m.select(
        "doc_id",
        "n_chars",
        canonicalize_url(F.col("raw_url")).alias("canonical_url"),
    ).withColumn(
        "host",
        F.regexp_extract("canonical_url", r"^[a-z]+://([^/:?#]*)", 1),
    )
    dup = F.count("*") - F.count_distinct(F.col("canonical_url"))
    return hosted.groupBy("host").agg(
        F.count("*").alias("n_fetches"),
        F.count_distinct(F.col("canonical_url")).alias("n_pages"),
        dup.alias("n_dup_fetches"),
        (dup.cast("double") / F.count("*")).alias("dup_fetch_ratio"),
        F.sum("n_chars").alias("total_chars"),
    )


# --------------------------------------------------------------------------
# crawl_frontier_schedule  (politeness scheduling: the frontier side of
# the crawl story — per-host fetch sequencing under a crawl delay, and
# host-affine worker sharding so one host never spans two workers)
# --------------------------------------------------------------------------

_CRAWL_DELAY_S = 2.0
_N_WORKERS = 8

# the ONE definition of the distinct canonical frontier (canonical_url,
# host, path) — shared by the scheduler and the robots filter in both
# engines, so the host/path extraction can never desynchronize between
# their oracles
_PAGES_CTE = f"""mangled AS (
  SELECT doc_id, n_chars, {_HOST_VARIANT_SQL} AS raw_url FROM documents
), pages AS (
  SELECT DISTINCT canonical_url,
         regexp_extract(canonical_url, '^[a-z]+://([^/:?#]*)', 1) AS host,
         regexp_replace(canonical_url, '^[a-z]+://[^/?#]*', '') AS path
  FROM (SELECT {{CANON}} AS canonical_url FROM mangled)
)""".replace("{CANON}", _canon_sql(_FRAG_STRIPPED))


def _frontier_pages(docs: DataFrame) -> DataFrame:
    """Spark twin of _PAGES_CTE: the distinct canonical frontier with
    host and path columns."""
    return (
        _host_mangled(docs)
        .select(canonicalize_url(F.col("raw_url")).alias("canonical_url"))
        .distinct()
        .select(
            "canonical_url",
            F.regexp_extract(
                "canonical_url", r"^[a-z]+://([^/:?#]*)", 1
            ).alias("host"),
            F.regexp_replace(
                "canonical_url", r"^[a-z]+://[^/?#]*", ""
            ).alias("path"),
        )
    )


_FRONTIER_ORACLE = f"""
WITH {_PAGES_CTE}, seq AS (
  SELECT canonical_url, host,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY canonical_url)
           AS fetch_seq
  FROM pages
)
SELECT canonical_url, host,
       CAST(fetch_seq AS BIGINT) AS fetch_seq,
       CAST((fetch_seq - 1) * {_CRAWL_DELAY_S} AS DOUBLE) AS scheduled_at_s,
       CAST((strpos('0123456789abcdef', substr(md5(host), 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(host), 2, 1)) - 1)
            AS BIGINT) % {_N_WORKERS} AS worker
FROM seq
"""


@register("crawl_frontier_schedule", _FRONTIER_ORACLE)
def crawl_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness scheduling over the canonical frontier: one fetch per
    _CRAWL_DELAY_S per host (fetch_seq is a per-host window rank; the
    serialization is inherent — politeness IS a per-host queue), and a
    deterministic md5-bucket worker assignment keyed by HOST so a
    host's queue never spans workers.  Scale shape: distinct-page
    dedup + per-host window both shuffle on host-cardinality keys; a
    mega-host makes one long queue, which is the crawl-delay physics,
    not a plan defect."""
    tune(spark)
    from pyspark.sql import Window

    pages = _frontier_pages(t(spark, sf_dir, "documents"))
    seq = pages.drop("path").withColumn(
        "fetch_seq",
        F.row_number().over(
            Window.partitionBy("host").orderBy("canonical_url")
        ).cast("long"),
    )
    hexes = "0123456789abcdef"
    h = F.md5("host")
    bucket = (
        (F.instr(F.lit(hexes), F.substring(h, 1, 1)) - 1) * 16
        + (F.instr(F.lit(hexes), F.substring(h, 2, 1)) - 1)
    ).cast("long")
    return seq.select(
        "canonical_url",
        "host",
        "fetch_seq",
        ((F.col("fetch_seq") - 1) * F.lit(_CRAWL_DELAY_S))
        .cast("double")
        .alias("scheduled_at_s"),
        (bucket % _N_WORKERS).alias("worker"),
    )


# --------------------------------------------------------------------------
# robots_disallow_filter  (robots-exclusion over the frontier: per-host
# Disallow PREFIX rules, the protocol's actual matching semantics —
# a page is fetchable iff no rule prefix-matches its path)
# --------------------------------------------------------------------------

_ROBOTS_RULE_MOD = 4  # host h<k> disallows /d/<m> for (k + m) % 4 == 0
_ROBOTS_MAX_RULE = 20

_ROBOTS_ORACLE = f"""
WITH {_PAGES_CTE}, rules AS (
  SELECT host, '/d/' || CAST(m AS VARCHAR) AS prefix
  FROM (SELECT DISTINCT host,
               CAST(substr(host, 2, 1) AS INTEGER) AS hostn
        FROM pages)
  CROSS JOIN range(0, {_ROBOTS_MAX_RULE}) t(m)
  WHERE (hostn + m) % {_ROBOTS_RULE_MOD} = 0
), verdicts AS (
  SELECT p.canonical_url, p.host, p.path,
         COUNT(r.prefix) AS n_rules_hit
  FROM pages p
  LEFT JOIN rules r
    ON r.host = p.host AND starts_with(p.path, r.prefix)
  GROUP BY p.canonical_url, p.host, p.path
)
SELECT canonical_url, host, path,
       CAST(n_rules_hit AS BIGINT) AS n_rules_hit,
       (n_rules_hit = 0) AS allowed
FROM verdicts
"""


@register("robots_disallow_filter", _ROBOTS_ORACLE)
def robots_disallow_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots-exclusion verdicts over the canonical frontier: each host
    publishes deterministic Disallow PREFIX rules (the protocol's real
    matching — `/d/1` blocks `/d/1`, `/d/10`, `/d/1/x`), and a page is
    fetchable iff no rule prefix-matches its path.  Scale shape: the
    rules table is host-cardinality x rules-per-host (KBs — robots
    files are small by construction), so the verdict join broadcasts;
    the frontier side is one distinct + one grouped count."""
    tune(spark)
    pages = _frontier_pages(t(spark, sf_dir, "documents"))
    rules = (
        pages.select(
            "host",
            F.substring("host", 2, 1).cast("int").alias("hostn"),
        )
        .distinct()
        .select(
            "host",
            F.explode(
                F.sequence(F.lit(0), F.lit(_ROBOTS_MAX_RULE - 1))
            ).alias("m"),
            "hostn",
        )
        .filter((F.col("hostn") + F.col("m")) % _ROBOTS_RULE_MOD == 0)
        .select(
            "host",
            F.concat(F.lit("/d/"), F.col("m").cast("string")).alias(
                "prefix"
            ),
        )
    )
    p, r = pages.alias("p"), rules.alias("r")
    verdicts = (
        p.join(
            F.broadcast(r),
            (F.col("p.host") == F.col("r.host"))
            & F.expr("startswith(p.path, r.prefix)"),
            "left",
        )
        .groupBy(
            F.col("p.canonical_url").alias("canonical_url"),
            F.col("p.host").alias("host"),
            F.col("p.path").alias("path"),
        )
        .agg(F.count("r.prefix").alias("n_rules_hit"))
    )
    return verdicts.select(
        "canonical_url",
        "host",
        "path",
        "n_rules_hit",
        (F.col("n_rules_hit") == 0).alias("allowed"),
    )


# --------------------------------------------------------------------------
# web_curation_pipeline  (the round-6 pieces COMPOSED: canonical-URL
# keep-best -> duplicate-span removal over the KEPT corpus — the order
# matters, because dropping URL-duplicates changes span frequencies,
# which is exactly why crawlers run URL dedup first)
# --------------------------------------------------------------------------

# span constants interpolated from dedup._SPAN_N (hardcoded literals
# would silently desynchronize this oracle if the span width changes)
from go_pulsar_elasticsearch_spark.llm.dedup import _SPAN_N as _PIPE_N

_PIPELINE_ORACLE = f"""
WITH mangled AS (
  SELECT doc_id, n_chars, {_VARIANT_SQL} AS raw_url FROM documents
), canon AS (
  SELECT doc_id,
         {_canon_sql(_FRAG_STRIPPED)} AS canonical_url
  FROM mangled
), kept AS (
  SELECT canonical_url, MIN(doc_id) AS doc_id
  FROM canon GROUP BY canonical_url
), words AS (
  SELECT d.doc_id, k.canonical_url, string_split(d.text, ' ') AS w
  FROM documents d JOIN kept k ON k.doc_id = d.doc_id
), grams AS (
  SELECT doc_id, i,
         md5(list_aggr(w[i:i+{_PIPE_N - 1}], 'string_agg', ' ')) AS h
  FROM (
    SELECT doc_id, w, unnest(range(1, len(w) - {_PIPE_N - 2})) AS i
    FROM words WHERE len(w) >= {_PIPE_N}
  )
), freq AS (
  SELECT h, COUNT(*) AS n FROM grams GROUP BY h
), dups AS (
  SELECT doc_id, i FROM grams JOIN freq USING (h) WHERE n > 1
), covered AS (
  SELECT DISTINCT doc_id, i + d AS p
  FROM dups CROSS JOIN range(0, {_PIPE_N}) t(d)
), positions AS (
  SELECT doc_id, p
  FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS p FROM words)
), keptpos AS (
  SELECT pos.doc_id, COUNT(*) AS n_kept
  FROM positions pos
  LEFT JOIN covered c ON c.doc_id = pos.doc_id AND c.p = pos.p
  WHERE c.p IS NULL
  GROUP BY pos.doc_id
)
SELECT w.doc_id,
       w.canonical_url,
       CAST(len(w.w) AS BIGINT) AS n_words,
       CAST(len(w.w) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed
FROM words w LEFT JOIN keptpos k ON k.doc_id = w.doc_id
"""


@register("web_curation_pipeline", _PIPELINE_ORACLE)
def web_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL keep-best THEN span removal, as one certified pipeline: the
    kept representative per canonical URL feeds dup_span_remove, whose
    corpus-wide gram frequencies are computed over the KEPT subset only
    (URL dedup first shrinks the frequency table AND changes which
    spans count as duplicated — the composition is not the sum of its
    parts, which is what this query certifies).  Plan shape: one URL
    aggregate, one semi-join back to the text, then dup_span_remove's
    one gram-frequency shuffle."""
    from go_pulsar_elasticsearch_spark.llm.dedup import dup_span_remove_df

    tune(spark)
    docs = t(spark, sf_dir, "documents")
    kept = (
        _mangled(docs)
        .select(
            "doc_id",
            canonicalize_url(F.col("raw_url")).alias("canonical_url"),
        )
        .groupBy("canonical_url")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    kept_docs = docs.join(kept, "doc_id").select(
        "doc_id", "canonical_url", "text"
    )
    cleaned = dup_span_remove_df(kept_docs.select("doc_id", "text"))
    return cleaned.join(
        kept_docs.select("doc_id", "canonical_url"), "doc_id"
    ).select("doc_id", "canonical_url", "n_words", "n_removed")
