"""Property evidence for the simple_query_string parser/compilers
(llm/query_string.py).

The registry oracle certifies ONE query end-to-end but parser and both
compilers share the AST, so a parser bug could produce the same wrong
query on both engines.  These properties close that loop with
machinery the operator does not share:

  1. render -> parse round-trip: parse(render(ast)) == ast for random
     ASTs (the parser is exercised against a generator it never saw).
  2. compiled == interpreted: the Spark-compiled predicate selects
     exactly the docs a plain-Python interpreter over token lists
     selects, for a batch of random ASTs at once.
  3. precedence pins: hand-written strings with known expected
     semantics (AND over OR, negation scope, default-OR adjacency).
"""

from __future__ import annotations

import random

import go_pulsar_elasticsearch_spark as gpe

gpe.load_all()

from pyspark.sql import functions as F  # noqa: E402

from go_pulsar_elasticsearch_spark.catalog import t  # noqa: E402
from go_pulsar_elasticsearch_spark.llm.query_string import (  # noqa: E402
    And,
    Not,
    Or,
    Phrase,
    Prefix,
    Term,
    compile_to_column,
    eval_python,
    parse_query_string,
    render_query_string,
)

_VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value",
    "part", "hash", "merge", "batch", "spark", "line", "sort", "window",
]


def _rand_ast(rng: random.Random, depth: int = 0):
    kinds = ["term", "prefix", "phrase"]
    if depth < 3:
        kinds += ["not", "and", "or"]
    k = rng.choice(kinds)
    if k == "term":
        return Term(rng.choice(_VOCAB))
    if k == "prefix":
        w = rng.choice(_VOCAB)
        return Prefix(w[: rng.randint(1, len(w))])
    if k == "phrase":
        n = rng.randint(2, 3)
        return Phrase(tuple(rng.choice(_VOCAB) for _ in range(n)))
    if k == "not":
        return Not(_rand_ast(rng, depth + 1))
    kids = tuple(
        _rand_ast(rng, depth + 1) for _ in range(rng.randint(2, 3))
    )
    return And(kids) if k == "and" else Or(kids)


def test_render_parse_roundtrip():
    rng = random.Random(80801)
    for _ in range(300):
        ast = _rand_ast(rng)
        assert parse_query_string(render_query_string(ast)) == ast


def test_compiled_matches_python_interpreter(spark, sf_dir):
    """One Spark pass evaluates 25 random ASTs as boolean columns; the
    result must equal the plain-Python interpreter doc-for-doc."""
    rng = random.Random(42424)
    asts = [_rand_ast(rng) for _ in range(25)]
    docs = t(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", F.split("text", " ").alias("w")
    )
    cols = [
        compile_to_column(a).alias(f"m{i}") for i, a in enumerate(asts)
    ]
    rows = staged.select("doc_id", "w", *cols).collect()
    assert rows
    nontrivial = 0
    for i, a in enumerate(asts):
        matched_spark = {r["doc_id"] for r in rows if r[f"m{i}"]}
        matched_py = {
            r["doc_id"] for r in rows if eval_python(a, list(r["w"]))
        }
        assert matched_spark == matched_py, render_query_string(a)
        if 0 < len(matched_spark) < len(rows):
            nontrivial += 1
    assert nontrivial >= 5  # the batch must exercise real selectivity


def test_precedence_and_syntax_pins():
    # AND binds tighter than OR
    ast = parse_query_string("slow OR fast AND table")
    assert ast == Or((Term("slow"), And((Term("fast"), Term("table")))))
    # adjacency is the default operator (OR)
    ast = parse_query_string("slow fast")
    assert ast == Or((Term("slow"), Term("fast")))
    # negation scopes over the immediately following clause only
    ast = parse_query_string("-slow fast")
    assert ast == Or((Not(Term("slow")), Term("fast")))
    # parens override precedence
    ast = parse_query_string("(slow OR fast) AND table")
    assert ast == And((Or((Term("slow"), Term("fast"))), Term("table")))
    # phrase + prefix
    ast = parse_query_string('"merge batch" ta*')
    assert ast == Or((Phrase(("merge", "batch")), Prefix("ta")))
    # evaluation sanity on a concrete token list
    words = "value table merge batch fast".split()
    assert eval_python(parse_query_string('"merge batch"'), words)
    assert not eval_python(parse_query_string('"batch merge"'), words)
    assert eval_python(parse_query_string("value AND ta*"), words)
    assert not eval_python(parse_query_string("-value"), words)
    # syntax errors surface, never silently match
    import pytest

    for bad in ["(slow", "AND", "slow AND", '""', "slow)"]:
        with pytest.raises(ValueError):
            parse_query_string(bad)
