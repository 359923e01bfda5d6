"""URL canonicalization rules, each against a handcrafted adversarial
variant (round-5 VERDICT #3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.ingest.urlnorm import canonicalize_url

CASES = [
    # fragment
    ("https://a.com/x#section-2", "https://a.com/x"),
    # scheme+host case (path case preserved!)
    ("HTTPS://A.CoM/KeepCase", "https://a.com/KeepCase"),
    # www
    ("https://www.a.com/x", "https://a.com/x"),
    # default ports
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:80/x", "http://a.com/x"),
    # non-default port survives
    ("https://a.com:8443/x", "https://a.com:8443/x"),
    # :80 on https is NOT default -> survives
    ("https://a.com:80/x", "https://a.com:80/x"),
    # tracking params: lone, leading, trailing, multiple
    ("https://a.com/x?utm_source=f", "https://a.com/x"),
    ("https://a.com/x?utm_source=f&q=1", "https://a.com/x?q=1"),
    ("https://a.com/x?q=1&gclid=abc", "https://a.com/x?q=1"),
    ("https://a.com/x?utm_a=1&utm_b=2", "https://a.com/x"),
    ("https://a.com/x?fbclid=9&q=1&ref=tw", "https://a.com/x?q=1"),
    # a real param whose VALUE contains 'utm_' survives
    ("https://a.com/x?q=utm_source", "https://a.com/x?q=utm_source"),
    # a real param whose NAME contains a tracking name survives
    # (unanchored 'ref=' would fire inside 'href=' — review finding)
    ("https://a.com/x?href=a&b=1", "https://a.com/x?href=a&b=1"),
    ("https://a.com/x?preference=1", "https://a.com/x?preference=1"),
    # ADJACENT tracking params followed by a real one (a global replace
    # never rescans its own output — the run must clear in one match)
    ("https://a.com/x?utm_a=1&utm_b=2&q=1", "https://a.com/x?q=1"),
    ("https://a.com/x?utm_a=1&gclid=2&utm_b=3&q=1&ref=z",
     "https://a.com/x?q=1"),
    # '/?' inside a query VALUE is data, not structure
    ("https://a.com/x/?q=/?y", "https://a.com/x?q=/?y"),
    # trailing slash after a query belongs to the query value
    ("https://a.com/x?q=a/", "https://a.com/x?q=a/"),
    # trailing slash: path, root, before query
    ("https://a.com/x/", "https://a.com/x"),
    ("https://a.com/", "https://a.com"),
    ("https://a.com/x/?q=1", "https://a.com/x?q=1"),
    # everything at once
    (
        "HTTPS://WWW.A.Com:443/Path/?utm_source=f&q=1&gclid=z#frag",
        "https://a.com/Path?q=1",
    ),
    # already canonical -> fixpoint
    ("https://a.com/x?q=1", "https://a.com/x?q=1"),
]


@pytest.fixture(scope="module")
def canon(spark):
    urls = [u for u, _ in CASES]
    df = spark.createDataFrame([(u,) for u in urls], "raw string")
    rows = df.select(
        "raw", canonicalize_url(F.col("raw")).alias("c")
    ).collect()
    return {r["raw"]: r["c"] for r in rows}


@pytest.mark.parametrize("raw,want", CASES)
def test_rule(canon, raw, want):
    assert canon[raw] == want


def test_idempotent(spark, canon):
    """canonical(canonical(u)) == canonical(u) for every case — the
    property that lets incremental pipelines re-canonicalize safely."""
    once = list(canon.values())
    df = spark.createDataFrame([(u,) for u in once], "raw string")
    twice = [
        r["c"]
        for r in df.select(
            canonicalize_url(F.col("raw")).alias("c")
        ).collect()
    ]
    assert sorted(twice) == sorted(once)
