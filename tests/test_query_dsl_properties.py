"""Property-based spec conformance for the ES Query-DSL compiler
(llm/query_dsl.py): hypothesis generates random query trees — every
leaf kind plus bool composition with must/filter/must_not/should and
explicit minimum_should_match — and the compiled Catalyst predicate
must select exactly the rows an INDEPENDENT Python evaluator of the
documented semantics selects, over a fixture that deliberately carries
NULLs in every filterable column (the 3-valued-logic corners: a null
term comparison drops the row in filter context, must_not treats null
as non-matching via the coalesce rule, and should-counting treats an
unsatisfiable clause as 0)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

import go_pulsar_elasticsearch_spark as gpe

gpe.load_all()

from go_pulsar_elasticsearch_spark.llm.query_dsl import (  # noqa: E402
    compile_query,
)

_SETTINGS = settings(max_examples=40, deadline=None)

# fixture rows: nulls in source/lang/n_chars, varied text token sets
_ROWS = [
    (0, "src1", "en", 100, "spark join window"),
    (1, "src2", "de", 250, "table scan spark"),
    (2, "src10", "en", 500, "join join window"),
    (3, None, "fr", 750, "spark"),
    (4, "src3", None, 900, "window table"),
    (5, "a", "en", None, ""),
    (6, "abc", "es", 300, "scan"),
    (7, "src1", None, None, "spark window"),
    (8, None, None, 50, "table"),
    (9, "b", "de", 425, "join window spark table"),
]
_COLS = ("doc_id", "source", "lang", "n_chars", "text")

_DF = {}


def _frame(spark):
    if "df" not in _DF:
        _DF["df"] = spark.createDataFrame(
            _ROWS, "doc_id long, source string, lang string,"
            " n_chars long, text string"
        ).cache()
    return _DF["df"]


# ---------------------------------------------------------------- reference

# Kleene 3-valued logic: True / False / None


def _and(a, b):
    if a is False or b is False:
        return False
    if a is None or b is None:
        return None
    return True


def _or(a, b):
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return False


_RANGE = {
    "gte": lambda x, v: x >= v,
    "gt": lambda x, v: x > v,
    "lte": lambda x, v: x <= v,
    "lt": lambda x, v: x < v,
}


def _ev(q, row):
    """Independent evaluator of the documented DSL semantics (returns
    True/False/None — filter context keeps only True)."""
    (kind, body), = q.items()
    if kind == "bool":
        out = True
        for c in body.get("must", []) + body.get("filter", []):
            out = _and(out, _ev(c, row))
        for c in body.get("must_not", []):
            sub = _ev(c, row)
            out = _and(out, not (sub is True))
        should = body.get("should", [])
        msm = body.get("minimum_should_match")
        if should:
            if msm is not None:
                n_sat = sum(1 for c in should if _ev(c, row) is True)
                out = _and(out, n_sat >= msm)
            elif body.get("must") or body.get("filter"):
                pass  # scoring-only in filter context
            else:
                any_s = False
                for c in should:
                    any_s = _or(any_s, _ev(c, row))
                out = _and(out, any_s)
        return out
    if kind == "term":
        (f, v), = body.items()
        x = row[f]
        return None if x is None else x == v
    if kind == "terms":
        (f, vs), = body.items()
        x = row[f]
        return None if x is None else x in list(vs)
    if kind == "range":
        (f, ops), = body.items()
        x = row[f]
        out = True
        for op, v in ops.items():
            out = _and(out, None if x is None else _RANGE[op](x, v))
        return out
    if kind == "exists":
        return row[body["field"]] is not None
    if kind == "prefix":
        (f, p), = body.items()
        x = row[f]
        return None if x is None else x.startswith(p)
    if kind == "wildcard":
        (f, pat), = body.items()
        x = row[f]
        if x is None:
            return None
        rx = "".join(
            ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
            for ch in pat
        )
        return re.fullmatch(rx, x) is not None
    if kind == "match":
        (f, text), = body.items()
        toks = [t for t in text.split() if t]
        if not toks:
            return False
        x = row[f]
        if x is None:
            return None
        have = x.split(" ")
        out = True
        for t in toks:
            out = _and(out, t in have)
        return out
    if kind == "regexp":
        (f, pat), = body.items()
        x = row[f]
        return None if x is None else re.fullmatch(pat, x) is not None
    if kind == "ids":
        f = body.get("field", "doc_id")
        x = row[f]
        return None if x is None else x in list(body["values"])
    raise AssertionError(kind)


# ---------------------------------------------------------------- strategies

_SRC_VALS = ["src1", "src2", "src10", "a", "b", "abc", "missing"]
_LANG_VALS = ["en", "de", "fr", "es", "xx"]
_WILDCARDS = ["src*", "s?c1", "*", "a*c", "??", "src1?"]
_REGEXPS = ["src[0-9]", "src[0-9]+", "(a|b)", "a.*", "src1|b"]

_leaf = st.one_of(
    st.sampled_from(_SRC_VALS).map(lambda v: {"term": {"source": v}}),
    st.sampled_from(_LANG_VALS).map(lambda v: {"term": {"lang": v}}),
    st.lists(st.sampled_from(_SRC_VALS), min_size=1, max_size=3).map(
        lambda vs: {"terms": {"source": vs}}
    ),
    st.builds(
        lambda lo, hi: {"range": {"n_chars": {"gte": lo, "lt": hi}}},
        st.integers(0, 1000),
        st.integers(0, 1000),
    ),
    st.sampled_from(["gte", "gt", "lte", "lt"]).flatmap(
        lambda op: st.integers(0, 10).map(
            lambda v: {"range": {"doc_id": {op: v}}}
        )
    ),
    st.sampled_from(_COLS).map(lambda f: {"exists": {"field": f}}),
    st.sampled_from(["s", "src", "a", "ab", ""]).map(
        lambda p: {"prefix": {"source": p}}
    ),
    st.sampled_from(_WILDCARDS).map(lambda p: {"wildcard": {"source": p}}),
    st.sampled_from(
        ["spark", "window", "spark window", "join table", "", "zz"]
    ).map(lambda t: {"match": {"text": t}}),
    st.sampled_from(_REGEXPS).map(lambda p: {"regexp": {"source": p}}),
    st.lists(st.integers(0, 12), min_size=1, max_size=4).map(
        lambda vs: {"ids": {"values": vs}}
    ),
)


def _bool_query(leaves):
    must, filt, must_not, should, msm = leaves
    body = {}
    if must:
        body["must"] = must
    if filt:
        body["filter"] = filt
    if must_not:
        body["must_not"] = must_not
    if should:
        body["should"] = should
        if msm is not None:
            body["minimum_should_match"] = msm
    if not body:
        body["must"] = []
    return {"bool": body}


_bool = st.builds(
    _bool_query,
    st.tuples(
        st.lists(_leaf, max_size=2),
        st.lists(_leaf, max_size=2),
        st.lists(_leaf, max_size=2),
        st.lists(_leaf, max_size=3),
        st.one_of(st.none(), st.integers(0, 3)),
    ),
)

_query = st.one_of(_leaf, _bool)


@_SETTINGS
@given(_query)
def test_compiled_predicate_matches_reference(spark, q):
    df = _frame(spark)
    got = {r.doc_id for r in df.filter(compile_query(q)).collect()}
    want = {
        row[0]
        for row in _ROWS
        if _ev(q, dict(zip(_COLS, row))) is True
    }
    assert got == want, f"query={q!r}"
