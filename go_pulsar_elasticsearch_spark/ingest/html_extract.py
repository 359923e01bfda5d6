"""HTML main-content extraction (boilerplate removal) for crawl intake.

A real WARC body is an HTML page: the training-worthy content is the
paragraph text, wrapped in chrome (head/title, nav menus, ad units,
footers, scripts) that pollutes a corpus if it survives — the
jusText / trafilatura step every web-curation pipeline runs between
fetch and quality filtering.

The fixture corpus is plain text, so — the media-op pattern
(llm/multimodal.py synthesizes BMP/WAV payloads from doc_id
arithmetic) — each document is first WRAPPED into a deterministic HTML
page (12-word paragraphs, plus a head block, nav menu, ad unit, footer,
and an entity-bearing content div), then the extractor recovers the
main content.  Both engines run the identical construct→extract chain,
so the certified hash covers the extraction REGEXES themselves: block
removal, tag stripping, line splitting, whitespace normalization, and
HTML entity decoding.

Extraction rules (fixed, RE2-safe — no lookahead/backrefs, so the same
pattern text runs on Java regex and DuckDB's RE2):
  1. drop the <head> block wholesale (title/script/meta never leak)
  2. drop <nav>…</nav> and <footer>…</footer>
  3. drop <div class="ad|promo"> blocks (the rule-based jusText cut;
     class="content" divs survive)
  4. closing </p> / </div> become line breaks; all remaining tags strip
  5. entities decode LAST, &amp; last of all (never double-decodes)

Scale shape: entirely narrow per-row expressions — construction and
extraction fuse into one WholeStageCodegen span over the scan; zero
shuffles, zero Python.  At 100 TB this is one pass over the page bytes,
the same cost class as gopher_quality_filter.

Reference parity: the reference ingests already-structured Avro records
(model.go:18-26); HTML extraction is the missing intake step for the
crawl-shaped corpus the north star targets (WARC bodies from
sources/warc_source.py carry exactly this shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

_PARA_WORDS = 12
_LB = "@@L@@"  # line-break marker (regex-inert, survives both engines)

# boilerplate block patterns, applied in order; all RE2-safe
_BLOCK_RES = [
    r"<head>.*?</head>",
    r"<nav[^>]*>.*?</nav>",
    r"<footer[^>]*>.*?</footer>",
    r'<div class="(ad|promo)"[^>]*>.*?</div>',
]

# entity decode pairs, &amp; LAST (decoding it earlier would re-decode
# the output of e.g. '&amp;lt;' into '<' — the classic double-decode bug)
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&amp;", "&")]

_CONTENT_DIV = (
    '<div class="content">Price &amp; availability: 50 &lt; 100</div>'
)
_NAV = '<nav class="menu"><a href="/">Home</a> <a href="/cat">Catalog</a></nav>'
_AD = '<div class="ad">Subscribe now &amp; save 50%!</div>'
_FOOTER = '<footer>(c) 2026 Example Corp <a href="/tos">Terms</a></footer>'


def _html_sql(dialect: str) -> str:
    """The deterministic page construction as SQL text: 12-word
    paragraphs from the document words plus the fixed chrome blocks.
    ``dialect`` is 'spark' or 'duckdb' (array slicing differs)."""
    if dialect == "spark":
        paras = (
            f"array_join(transform(sequence(1, CAST(ceil(size(split(text, ' '))"
            f" / {_PARA_WORDS}.0) AS INT)),"
            f" i -> concat('<p>', concat_ws(' ',"
            f" slice(split(text, ' '), (i - 1) * {_PARA_WORDS} + 1,"
            f" {_PARA_WORDS})), '</p>')), '')"
        )
    else:
        paras = (
            f"array_to_string(list_transform(range(1,"
            f" CAST(ceil(len(string_split(text, ' '))"
            f" / {_PARA_WORDS}.0) AS INT) + 1),"
            f" i -> '<p>' || array_to_string(string_split(text, ' ')"
            f"[(i - 1) * {_PARA_WORDS} + 1 : (i - 1) * {_PARA_WORDS}"
            f" + {_PARA_WORDS}], ' ') || '</p>'), '')"
        )
    head = (
        "'<html><head><title>doc ' || CAST(doc_id AS STRING) || '</title>"
        '<script type="text/javascript">var t=1;track(t);</script>'
        "</head><body>'"
    )
    if dialect == "duckdb":
        head = head.replace("AS STRING", "AS VARCHAR")
    parts = [
        head,
        f"'{_NAV}'",
        paras,
        f"'{_AD}'",
        f"'{_CONTENT_DIV}'",
        f"'{_FOOTER}'",
        "'</body></html>'",
    ]
    return "(" + " || ".join(parts) + ")"


def _extract_sql(html: str, dialect: str) -> tuple[str, str]:
    """The extraction chain over a ``html`` SQL expression: returns
    (joined_main_text_expr, lines_array_expr)."""
    g = lambda expr, pat, rep: (  # noqa: E731 — dialect-switched replace-all
        f"regexp_replace({expr}, '{pat}', '{rep}')"
        if dialect == "spark"
        else f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    )
    s = html
    for pat in _BLOCK_RES:
        s = g(s, pat, "")
    s = g(s, "</p>|</div>", _LB)
    s = g(s, "<[^>]*>", "")
    if dialect == "spark":
        lines = (
            f"filter(transform(split({s}, '{_LB}'), x -> trim(x)),"
            f" x -> x != '')"
        )
        joined = f"array_join({lines}, '\\n')"
    else:
        lines = (
            f"list_filter(list_transform(string_split_regex({s}, '{_LB}'),"
            f" x -> trim(x)), x -> x != '')"
        )
        joined = f"array_to_string({lines}, chr(10))"
    for ent, ch in _ENTITIES:
        quoted = ch.replace("'", "''")
        joined = f"replace({joined}, '{ent}', '{quoted}')"
    return joined, lines


_SPARK_HTML = _html_sql("spark")
_DUCK_HTML = _html_sql("duckdb")
_SPARK_MAIN, _SPARK_LINES = _extract_sql(_SPARK_HTML, "spark")
_DUCK_MAIN, _DUCK_LINES = _extract_sql(_DUCK_HTML, "duckdb")

_HTML_ORACLE = f"""
SELECT doc_id,
       CAST(len({_DUCK_LINES}) AS BIGINT) AS n_blocks,
       CAST(length({_DUCK_MAIN}) AS BIGINT) AS main_len,
       md5({_DUCK_MAIN}) AS main_md5
FROM documents
"""


@register("html_extract_main", _HTML_ORACLE)
def html_extract_main(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-strip the synthesized HTML page of every document and
    emit the surviving block count, main-text length, and an md5 over
    the reassembled main text — so the certification pins the exact
    extraction output, not just counts.  See module docstring for the
    rule chain; the whole op is scan-fused expressions (no shuffle, no
    Python)."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(f"size({_SPARK_LINES})").cast("bigint").alias("n_blocks"),
        F.expr(f"length({_SPARK_MAIN})").cast("bigint").alias("main_len"),
        F.expr(f"md5({_SPARK_MAIN})").alias("main_md5"),
    )
