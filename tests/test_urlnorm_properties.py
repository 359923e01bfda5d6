"""Property-based spec conformance for the URL canonicalizer
(ingest/urlnorm.py): hypothesis composes random URLs — mixed-case
authorities, www prefixes, default and non-default ports, tracking and
near-miss query params in every position, trailing slashes, fragments —
and the JVM regexp chain must agree with an INDEPENDENT procedural
Python implementation of the six documented rules (parse/remove/rejoin
mechanics, not regex rewrites), including the adversarial corners the
rules call out: `xref=`/`refx=` must survive, `/?` inside a query value
is data, adjacent tracking params clear completely."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

import go_pulsar_elasticsearch_spark as gpe

gpe.load_all()

from pyspark.sql import functions as F  # noqa: E402

from go_pulsar_elasticsearch_spark.ingest.urlnorm import (  # noqa: E402
    canonicalize_url,
)

_SETTINGS = settings(max_examples=15, deadline=None)

_TRK_NAME = re.compile(r"^(utm_[A-Za-z]+|gclid|fbclid|ref)$")


def _ref_canon(url: str) -> str:
    """Independent procedural implementation of the documented rules."""
    # 1 fragment
    u = url.split("#", 1)[0]
    # 2 lowercase scheme://authority (authority ends at first / ? #)
    m = re.match(r"^([^/?#]*//[^/?#]*)(.*)$", u, re.S)
    if m:
        u = m.group(1).lower() + m.group(2)
    # 3 leading www.
    for s in ("https://", "http://"):
        p = s + "www."
        if u.startswith(p):
            u = s + u[len(p):]
            break
    # 4 default ports (host part carries no colon of its own)
    m = re.match(r"^(https?)://([^/?#]*)(.*)$", u, re.S)
    if m:
        scheme, auth, rest = m.groups()
        default = ":443" if scheme == "https" else ":80"
        if auth.endswith(default) and ":" not in auth[: -len(default)]:
            auth = auth[: -len(default)]
        u = f"{scheme}://{auth}{rest}"
    # 5 tracking params: parse the query, drop fully-matching k=v params
    if "?" in u:
        pre, q = u.split("?", 1)
        parts = q.split("&")
        kept = [
            p
            for p in parts
            if not ("=" in p and _TRK_NAME.match(p.split("=", 1)[0]))
        ]
        u = pre + ("?" + "&".join(kept) if kept else "")
    # 6 trailing slashes at the path/query boundary and the path end
    if "?" in u:
        pre, post = u.split("?", 1)
        u = pre.rstrip("/") + "?" + post
    else:
        u = u.rstrip("/")
    return u


_hosts = st.sampled_from(
    ["Example.COM", "corpus.local", "A.b.C", "host"]
)
_www = st.sampled_from(["", "www.", "WWW.", "wWw."])
_scheme = st.sampled_from(["http", "https"])
_port = st.sampled_from(["", ":443", ":80", ":8080"])
_seg = st.sampled_from(["d", "P1", "x", "Yz"])
_pname = st.sampled_from(
    ["utm_source", "utm_X", "gclid", "fbclid", "ref", "a", "b2",
     "xref", "refx", "utm_"]
)
_pval = st.sampled_from(["", "1", "xy", "a/b", "A-B"])
_frag = st.sampled_from(["", "#f", "#a/b?c"])


@st.composite
def _urls(draw):
    scheme = draw(_scheme)
    www = draw(_www)
    host = draw(_hosts)
    port = draw(_port)
    segs = draw(st.lists(_seg, max_size=3))
    trail = draw(st.sampled_from(["", "/", "//"]))
    params = draw(
        st.lists(st.tuples(_pname, _pval), max_size=4)
    )
    frag = draw(_frag)
    path = ("/" + "/".join(segs)) if segs else ""
    q = "&".join(f"{k}={v}" for k, v in params)
    return (
        f"{scheme}://{www}{host}{port}{path}{trail}"
        + (f"?{q}" if q else "")
        + frag
    )


@_SETTINGS
@given(st.lists(_urls(), min_size=1, max_size=25))
def test_canonicalizer_matches_procedural_reference(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "raw_url string")
    got = [
        r.c
        for r in df.select(
            canonicalize_url(F.col("raw_url")).alias("c")
        ).collect()
    ]
    want = [_ref_canon(u) for u in urls]
    assert got == want, list(zip(urls, got, want))
