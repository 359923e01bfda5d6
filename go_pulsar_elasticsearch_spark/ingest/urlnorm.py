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
