"""The crawl -> training-corpus FLAGSHIP (round-6 VERDICT #1): every
curation stage the repo certifies individually, COMPOSED as one query
and certified end-to-end by one chained DuckDB oracle —

  warc_ingest            crawl records with adversarially MANGLED URLs
                         (written into the WARC Target-URI, so the
                         pipeline canonicalizes what it actually read)
  url_canonical_dedup    keep the lowest-id fetch per canonical URL
  gopher_quality_filter  the Gopher rule battery, conjunctive keep
  near-dup drop          MinHash band signatures; any doc agreeing with
                         a LOWER-id doc on >= 4 of 8 bands is dropped
                         (the greedy keep-lowest policy of the
                         streaming incremental dedup, expressed batch)
  dup_span_remove        corpus-duplicate word-10-gram excision over
                         the SURVIVING corpus
  pack_sequences         token-budget bin manifest over the cleaned
                         text, in doc_id order

Composition is where ordering effects live (round-6 evidence: span
removal differs on 9 docs after URL dedup) — each stage's statistics
(gram frequencies, band buckets) are computed over the PREVIOUS stage's
survivors, so the end-to-end hash certifies the ordering, not just the
stages.

The streaming twin (streaming/url_dedup.py + run_crawl_corpus_stream
below) feeds the same corpus through foreachBatch: the URL keep-best
store accumulates incrementally per epoch (the stage that CAN be
incremental — one associative merge), and the corpus-global stages
(gram/band frequencies are functions of the whole surviving corpus by
definition) run once at finalize over the accumulated spool, converging
to this query's exact hash (tests/test_crawl_pipeline.py).

100 TB posture: URL keep-best is one hash aggregate on the canonical
string; the gopher gate is a narrow scan-fused projection; the MinHash
drop is the banded bucket join (never all-pairs); span removal's wide
state is the gram-frequency table; packing uses the two-pass prefix sum
(functions/prefix.py) — no global-sort window anywhere.

Reference parity: the reference is the ingest half only (consume ->
decode -> index, main.go:250-325); this pipeline is the engine's
north-star extension of that pipe into corpus curation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.ingest.urlnorm import (
    _canon_sql,
    _FRAG_STRIPPED,
    _VARIANT_SQL,
    canonicalize_url,
)
from go_pulsar_elasticsearch_spark.ingest.warc import _materialize_warc
from go_pulsar_elasticsearch_spark.llm.corpus import _BIN_TOKENS
from go_pulsar_elasticsearch_spark.llm.dedup import (
    _SPAN_N,
    dup_span_remove_df,
    minhash_band_sigs,
)
from go_pulsar_elasticsearch_spark.llm.quality import _STOP_IN, gopher_gate
from go_pulsar_elasticsearch_spark.llm.text_analysis import _BPE_RE
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune
from go_pulsar_elasticsearch_spark.sources.warc_source import (
    register_warc_source,
)

_MIN_BANDS = 4  # of 8 — same threshold as streaming/near_dedup.py


def warc_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, raw_url, text): the crawl surface as READ from WARC
    files whose Target-URI carries the mangled URL fixture — the
    pipeline's single entry point, shared by the batch flagship and the
    streaming twin's source spool."""
    warc_dir = _materialize_warc(sf_dir, mangle_urls=True)
    register_warc_source(spark)
    raw = spark.read.format("warc_sim").option("path", warc_dir).load()
    return raw.select(
        F.regexp_extract("record_id", r"urn:gpe:doc:(\d+)", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("target_uri").alias("raw_url"),
        F.col("body").alias("text"),
    )


def kept_by_canonical_url(corpus: DataFrame) -> DataFrame:
    """Stage 2 — URL keep-best: (doc_id, text) of the lowest-id fetch
    per canonical URL.  One hash aggregate on the canonical string plus
    one id-join back to the text (the text column never rides the URL
    shuffle)."""
    from go_pulsar_elasticsearch_spark.functions.caching import (
        checkpoint_slot,
    )

    # the WARC read is a PYTHON data-source scan (warc_sim) — by far
    # the most expensive leaf in this pipeline — and `canon` feeds two
    # consumers here while the returned frame feeds two more
    # downstream, so without truncation the Python scan's lineage is
    # re-analyzed AND re-executed once per reference (measured r8 opt:
    # construct+analyze of the full flagship was 14 s).  One eager
    # checkpoint runs the scan+canonicalize once; every consumer reads
    # the materialized frame (guide §3.3).
    canon = checkpoint_slot(
        "crawl_canon",
        corpus.select(
            "doc_id",
            canonicalize_url(F.col("raw_url")).alias("canonical_url"),
            "text",
        ),
    )
    kept_ids = canon.groupBy("canonical_url").agg(
        F.min("doc_id").alias("doc_id")
    )
    return canon.select("doc_id", "text").join(
        kept_ids.select("doc_id"), "doc_id"
    )


def curated_manifest(kept: DataFrame) -> DataFrame:
    """Stages 3-6 over the URL-deduped corpus: gopher gate ->
    greedy MinHash near-dup drop -> duplicate-span excision ->
    token-budget bin manifest.  Shared verbatim by the batch flagship
    and the streaming twin's finalize, so convergence is by
    construction once the kept sets agree."""
    from go_pulsar_elasticsearch_spark.functions.caching import (
        checkpoint_slot,
    )

    gate = gopher_gate(kept).filter(F.col("keep")).select("doc_id")
    # corpus1 feeds the band-sig builder (whose self-join references it
    # twice more) AND the near-dup anti-join: checkpoint so the
    # URL-keep-best join + gopher regex battery run once, not once per
    # reference (see kept_by_canonical_url's note; same guide §3.3 fix)
    corpus1 = checkpoint_slot("crawl_corpus1", kept.join(gate, "doc_id"))
    sigs = minhash_band_sigs(corpus1)
    a, b = sigs.alias("a"), sigs.alias("b")
    drops = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("lo"), F.col("b.doc_id").alias("doc_id"))
        .agg(F.count("*").alias("n_bands"))
        .filter(F.col("n_bands") >= _MIN_BANDS)
        .select("doc_id")
        .distinct()
    )
    corpus2 = corpus1.join(drops, "doc_id", "left_anti")
    cleaned = dup_span_remove_df(corpus2)
    from go_pulsar_elasticsearch_spark.functions.prefix import (
        global_running_sum,
    )

    n_tokens = F.size(
        F.regexp_extract_all("cleaned_text", F.lit(_BPE_RE), 0)
    ).cast("bigint")
    cum = global_running_sum(
        cleaned.select("doc_id", n_tokens.alias("n_tokens")),
        [F.col("doc_id")],
        "n_tokens",
        "running",
        "crawl_pack_prefix",
    )
    # greatest(running-1, 0): a zero-token prefix doc (fully span-
    # excised text) has running=0, and the nonnegative operand is what
    # keeps Spark's floor division and DuckDB's truncating `//`
    # identical (floor(-1/B) = -1 but -1//B = 0 in DuckDB)
    binned = cum.select(
        "doc_id",
        "n_tokens",
        F.floor(
            F.greatest(F.col("running") - 1, F.lit(0)) / _BIN_TOKENS
        ).alias("bin_id"),
    )
    return binned.groupBy("bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


_CRAWL_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, {_VARIANT_SQL} AS raw_url, text FROM documents
), canon AS (
  SELECT doc_id, text,
         {_canon_sql(_FRAG_STRIPPED)} AS canonical_url
  FROM corpus
), kept_ids AS (
  SELECT MIN(doc_id) AS doc_id FROM canon GROUP BY canonical_url
), kept AS (
  SELECT c.doc_id, c.text FROM canon c JOIN kept_ids k USING (doc_id)
), gwords AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM kept
), gm AS (
  SELECT doc_id,
         len(w) AS n_words,
         CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE) / len(w)
           AS mwl,
         CAST(len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
           / len(text) AS sym,
         len(list_filter(w, x -> x IN ({_STOP_IN}))) AS stop_hits
  FROM gwords WHERE len(w) > 0
), corpus1 AS (
  SELECT k.doc_id, k.text
  FROM kept k JOIN gm ON gm.doc_id = k.doc_id
  WHERE (gm.n_words BETWEEN 50 AND 100000)
    AND (gm.mwl BETWEEN 3.0 AND 10.0)
    AND (gm.sym < 0.1)
    AND (gm.stop_hits >= 2)
), shingles AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM (
    SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus1)
    WHERE len(w) >= 3
  )
), sigs AS (
  SELECT doc_id, band,
         MIN(md5(CAST(band AS VARCHAR) || ':' || shingle)) AS sig
  FROM (SELECT doc_id, shingle, unnest(range(0, 8)) AS band FROM shingles)
  GROUP BY doc_id, band
), drops AS (
  SELECT DISTINCT b.doc_id
  FROM sigs a
  JOIN sigs b ON a.band = b.band AND a.sig = b.sig
              AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING COUNT(*) >= {_MIN_BANDS}
), corpus2 AS (
  SELECT c.doc_id, c.text FROM corpus1 c
  WHERE c.doc_id NOT IN (SELECT doc_id FROM drops)
), words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM corpus2
), grams AS (
  SELECT doc_id, i,
         md5(list_aggr(w[i:i+{_SPAN_N - 1}], 'string_agg', ' ')) AS h
  FROM (
    SELECT doc_id, w, unnest(range(1, len(w) - {_SPAN_N - 2})) AS i
    FROM words WHERE len(w) >= {_SPAN_N}
  )
), freq AS (
  SELECT h, COUNT(*) AS n FROM grams GROUP BY h
), dups AS (
  SELECT doc_id, i FROM grams JOIN freq USING (h) WHERE n > 1
), covered AS (
  SELECT DISTINCT doc_id, i + d AS p
  FROM dups CROSS JOIN range(0, {_SPAN_N}) t(d)
), positions AS (
  SELECT doc_id, p, w[p] AS word
  FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS p FROM words)
), keptw AS (
  SELECT pos.doc_id,
         string_agg(pos.word, ' ' ORDER BY pos.p) AS cleaned_text
  FROM positions pos
  LEFT JOIN covered c ON c.doc_id = pos.doc_id AND c.p = pos.p
  WHERE c.p IS NULL
  GROUP BY pos.doc_id
), cleaned AS (
  SELECT w.doc_id, COALESCE(k.cleaned_text, '') AS cleaned_text
  FROM words w LEFT JOIN keptw k ON k.doc_id = w.doc_id
), toks AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(cleaned_text, '{_BPE_RE}')) AS BIGINT)
           AS n_tokens
  FROM cleaned
), cum AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
  FROM toks
), binned AS (
  SELECT doc_id, n_tokens,
         CAST(greatest(running - 1, 0) // {_BIN_TOKENS} AS BIGINT) AS bin_id
  FROM cum
)
SELECT bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc,
       CAST(MAX(doc_id) AS BIGINT) AS last_doc
FROM binned GROUP BY bin_id
"""


@register("crawl_corpus_pipeline", _CRAWL_ORACLE)
def crawl_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The six-stage crawl->corpus flagship, hash-certified end to end
    by ONE chained oracle (every stage's CTE is the certified
    single-stage oracle re-rooted on its predecessor's survivors).
    Output is the training-shard manifest: bin -> doc range + token
    count."""
    tune(spark)
    return curated_manifest(
        kept_by_canonical_url(warc_corpus(spark, sf_dir))
    )


def _drive_crawl_stream(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str, str]:
    """Drain the WARC corpus through the shared fixture once per
    (process, sf_dir); the ONE drained stream maintains three stores —
    the raw spool, the URL keep-best partials, and the per-bucket
    crawl census — so both `crawl_corpus_stream` and
    `crawl_stats_stream` certify off a single drain (round-7 VERDICT
    #5: consolidate the harness apparatus, not the certifications).
    The epoch split is the shared _FLIP_RANGES (low doc_ids last, so
    keep-best decisions genuinely flip at merge time)."""
    from go_pulsar_elasticsearch_spark.streaming.drain import (
        drain_file_stream,
        drained,
        id_range_predicates,
    )
    from go_pulsar_elasticsearch_spark.streaming.url_dedup import (
        _FLIP_RANGES,
        crawl_batch_body,
    )

    def build() -> tuple[str, str, str]:
        corpus = warc_corpus(spark, sf_dir)

        def factory(base: str):
            return crawl_batch_body(
                os.path.join(base, "spool"),
                os.path.join(base, "store"),
                os.path.join(base, "stats"),
            )

        base = drain_file_stream(
            spark,
            corpus,
            "doc_id long, raw_url string, text string",
            id_range_predicates(F.col("doc_id"), _FLIP_RANGES),
            factory,
            "gpe-crawlstream-",
        )
        return (
            os.path.join(base, "spool"),
            os.path.join(base, "store"),
            os.path.join(base, "stats"),
        )

    return drained(("crawl_stream", sf_dir), build)


@register("crawl_corpus_stream", _CRAWL_ORACLE)
def crawl_corpus_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship's STREAMING twin, hash-certified by the SAME
    chained oracle: crawl records arrive in micro-batches under
    foreachBatch, the canonical-URL keep-best store accumulates
    incrementally (epoch-keyed associative partials, replay-
    idempotent), and finalize runs the shared downstream over the
    spooled corpus — converging bit-for-bit to the batch manifest, the
    same certification pattern as pulsar_delivery_stream vs the
    hand-rolled loop."""
    tune(spark)
    spool, store, _stats = _drive_crawl_stream(spark, sf_dir)
    from go_pulsar_elasticsearch_spark.streaming.url_dedup import (
        finalize_crawl_corpus,
    )

    return finalize_crawl_corpus(spark, spool, store)


_STATS_ORACLE = """
SELECT CAST(doc_id % 8 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(text)) AS BIGINT) AS n_chars
FROM documents GROUP BY 1
"""


@register("crawl_stats_stream", _STATS_ORACLE)
def crawl_stats_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl census — per doc_id bucket, fetched docs and bytes —
    maintained as the THIRD store of the crawl drain (same stream, same
    epochs as `crawl_corpus_stream`; zero extra drains): per-epoch SUM
    partials, merged by associative re-aggregation, certified exactly
    against the batch aggregate over the full fetch surface.  This is
    the two-stores-one-drain pattern a production frontier runs — the
    monitoring census rides the ingest stream it monitors."""
    tune(spark)
    _spool, _store, stats = _drive_crawl_stream(spark, sf_dir)
    from go_pulsar_elasticsearch_spark.streaming.url_dedup import (
        read_stats_store,
    )

    return read_stats_store(spark, stats)
