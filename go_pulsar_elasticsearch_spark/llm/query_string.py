"""ES ``simple_query_string``: the user-facing mini query language.

The one query surface left between the JSON DSL (llm/query_dsl.py) and
the analyzed full-text family: the search-box syntax Kibana sends as
``simple_query_string``.  Supported operators (the subset ES documents
as its core):

  term            bare word                  -> token match
  term*           trailing wildcard          -> prefix match
  "a b"           quoted phrase              -> adjacent-token match
  -clause         negation
  a AND b / a b   conjunction / default op   (default_operator=OR below,
  a OR b                                      ES's own default)
  ( ... )         grouping

The STRING is parsed by a recursive-descent parser into an AST; the AST
compiles to a Spark Column predicate and, through a mirrored renderer,
to the DuckDB boolean the oracle runs — so the certified surface is
parse -> compile -> execute end-to-end.  Because parser and both
compilers share the AST, the property suite
(tests/test_query_string_properties.py) closes the loop independently:
random ASTs are rendered to query strings, re-parsed (round-trip
equality), and evaluated by a plain-Python interpreter against the
engine result row-for-row.

100 TB posture: the parse is driver-side on a KB string; the compiled
predicate is per-row token-array logic fused into the scan (the staged
split + single-level lambdas of the span family) — zero shuffle, and a
conjunctive term gate (`array_contains`) short-circuits before any
positional phrase check runs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Union

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

# ---------------------------------------------------------------- AST


@dataclass(frozen=True)
class Term:
    word: str


@dataclass(frozen=True)
class Prefix:
    stem: str


@dataclass(frozen=True)
class Phrase:
    words: tuple


@dataclass(frozen=True)
class Not:
    child: "Node"


@dataclass(frozen=True)
class And:
    kids: tuple


@dataclass(frozen=True)
class Or:
    kids: tuple


Node = Union[Term, Prefix, Phrase, Not, And, Or]

# ------------------------------------------------------------- parser

_TOKEN_RE = re.compile(
    r"""\s*(?:(?P<lp>\()|(?P<rp>\))|(?P<phrase>"[^"]*")"""
    r"""|(?P<word>[A-Za-z0-9_]+\*?)|(?P<neg>-))"""
)


def parse_query_string(q: str) -> Node:
    """Recursive descent over the token stream.  Grammar:

      or   := and (OR and)*
      and  := unary ((AND | <adjacent>) unary)*   # bare adjacency = OR
      unary:= '-' unary | '(' or ')' | PHRASE | WORD['*']

    ES's default_operator=OR: two adjacent clauses with no keyword
    combine with OR; only the explicit AND conjoins.  AND binds
    tighter than OR, as in ES."""
    toks: list[tuple[str, str]] = []
    pos = 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m:
            if q[pos:].strip():
                raise ValueError(f"bad query syntax at {q[pos:]!r}")
            break
        pos = m.end()
        for kind in ("lp", "rp", "phrase", "word", "neg"):
            v = m.group(kind)
            if v is not None:
                toks.append((kind, v))
                break
    i = 0

    def peek():
        return toks[i] if i < len(toks) else (None, None)

    def eat(kind):
        nonlocal i
        k, v = peek()
        if k != kind:
            raise ValueError(f"expected {kind}, got {k}:{v}")
        i += 1
        return v

    def unary() -> Node:
        k, v = peek()
        if k == "neg":
            eat("neg")
            return Not(unary())
        if k == "lp":
            eat("lp")
            n = or_expr()
            eat("rp")
            return n
        if k == "phrase":
            words = tuple(w for w in eat("phrase")[1:-1].split(" ") if w)
            if not words:
                raise ValueError("empty phrase")
            return Phrase(words)
        if k == "word":
            w = eat("word")
            if w in ("AND", "OR"):
                raise ValueError(f"operator {w} in term position")
            return Prefix(w[:-1]) if w.endswith("*") else Term(w)
        raise ValueError(f"unexpected token {k}:{v}")

    def and_expr() -> Node:
        kids = [unary()]
        while True:
            k, v = peek()
            if k == "word" and v == "AND":
                eat("word")
                kids.append(unary())
            else:
                break
        return kids[0] if len(kids) == 1 else And(tuple(kids))

    def or_expr() -> Node:
        kids = [and_expr()]
        while True:
            k, v = peek()
            if k == "word" and v == "OR":
                eat("word")
                kids.append(and_expr())
            elif k in ("lp", "phrase", "neg") or (
                k == "word" and v not in ("AND", "OR")
            ):
                # adjacency = the default operator (OR)
                kids.append(and_expr())
            else:
                break
        return kids[0] if len(kids) == 1 else Or(tuple(kids))

    n = or_expr()
    if i != len(toks):
        raise ValueError(f"trailing tokens: {toks[i:]}")
    return n


def render_query_string(n: Node) -> str:
    """AST -> canonical query string (the property suite's round-trip
    partner: parse(render(ast)) == ast).  Children of AND/OR are
    parenthesized so precedence survives rendering."""
    if isinstance(n, Term):
        return n.word
    if isinstance(n, Prefix):
        return n.stem + "*"
    if isinstance(n, Phrase):
        return '"' + " ".join(n.words) + '"'
    if isinstance(n, Not):
        return "-" + render_query_string(n.child)
    if isinstance(n, And):
        return "(" + " AND ".join(
            "(" + render_query_string(k) + ")" for k in n.kids
        ) + ")"
    if isinstance(n, Or):
        return "(" + " OR ".join(
            "(" + render_query_string(k) + ")" for k in n.kids
        ) + ")"
    raise TypeError(type(n))


# ----------------------------------------------------------- compilers
# Both compilers assume a staged token-array column ``w`` (one split per
# row, the span-family staging rule).


def compile_to_column(n: Node) -> Column:
    if isinstance(n, Term):
        return F.array_contains("w", n.word)
    if isinstance(n, Prefix):
        return F.expr(
            f"exists(w, x -> startswith(x, '{n.stem}'))"
        )
    if isinstance(n, Phrase):
        conds = " AND ".join(
            f"element_at(w, j + {k}) = '{wd}'"
            for k, wd in enumerate(n.words)
        )
        # conjunctive postings gate first: a doc lacking any phrase
        # word cannot match, and array_contains short-circuits the
        # positional lambda (the span-family order of operations)
        gate = None
        for wd in n.words:
            c = F.array_contains("w", wd)
            gate = c if gate is None else gate & c
        pos = F.expr(
            f"exists(sequence(1, size(w) - {len(n.words) - 1}),"
            f" j -> {conds})"
        )
        return gate & pos
    if isinstance(n, Not):
        return ~compile_to_column(n.child)
    if isinstance(n, And):
        out = compile_to_column(n.kids[0])
        for k in n.kids[1:]:
            out = out & compile_to_column(k)
        return out
    if isinstance(n, Or):
        out = compile_to_column(n.kids[0])
        for k in n.kids[1:]:
            out = out | compile_to_column(k)
        return out
    raise TypeError(type(n))


def compile_to_duckdb(n: Node) -> str:
    if isinstance(n, Term):
        return f"list_contains(w, '{n.word}')"
    if isinstance(n, Prefix):
        return f"len(list_filter(w, x -> starts_with(x, '{n.stem}'))) > 0"
    if isinstance(n, Phrase):
        conds = " AND ".join(
            f"w[j + {k}] = '{wd}'" for k, wd in enumerate(n.words)
        )
        gate = " AND ".join(
            f"list_contains(w, '{wd}')" for wd in n.words
        )
        return (
            f"({gate} AND len(list_filter("
            f"range(1, len(w) - {len(n.words) - 1} + 1),"
            f" j -> {conds})) > 0)"
        )
    if isinstance(n, Not):
        return f"(NOT {compile_to_duckdb(n.child)})"
    if isinstance(n, And):
        return "(" + " AND ".join(compile_to_duckdb(k) for k in n.kids) + ")"
    if isinstance(n, Or):
        return "(" + " OR ".join(compile_to_duckdb(k) for k in n.kids) + ")"
    raise TypeError(type(n))


def eval_python(n: Node, words: list) -> bool:
    """Independent plain-Python interpreter over a token list — the
    property suite's ground truth (no Spark, no SQL)."""
    if isinstance(n, Term):
        return n.word in words
    if isinstance(n, Prefix):
        return any(x.startswith(n.stem) for x in words)
    if isinstance(n, Phrase):
        k = len(n.words)
        return any(
            tuple(words[j:j + k]) == n.words
            for j in range(len(words) - k + 1)
        )
    if isinstance(n, Not):
        return not eval_python(n.child, words)
    if isinstance(n, And):
        return all(eval_python(k, words) for k in n.kids)
    if isinstance(n, Or):
        return any(eval_python(k, words) for k in n.kids)
    raise TypeError(type(n))


# ------------------------------------------------- certified example

_QS_QUERY = '(value AND ta*) OR ("merge batch" -slow)'
_QS_AST = parse_query_string(_QS_QUERY)

_QUERY_STRING_ORACLE = f"""
SELECT doc_id, source, n_chars
FROM (SELECT doc_id, source, n_chars,
             string_split(text, ' ') AS w FROM documents)
WHERE {compile_to_duckdb(_QS_AST)}
"""


@register("simple_query_string", _QUERY_STRING_ORACLE)
def simple_query_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``simple_query_string``: the search-box query
    '{q}' parsed by the recursive-descent grammar and compiled to
    per-row token-array predicates — prefix via exists/startswith,
    the quoted phrase via a postings gate + one adjacency lambda,
    explicit AND above the default-OR adjacency, '-' negation.  The
    oracle runs the mirrored DuckDB rendering of the SAME AST, and
    the property suite closes the parser/compiler loop independently
    (render->parse round-trip + plain-Python evaluation).

    Plan: one staged tokenization, scan-fused boolean logic, zero
    shuffle."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", "source", "n_chars", F.split("text", " ").alias("w")
    )
    return staged.filter(compile_to_column(_QS_AST)).select(
        "doc_id", "source", "n_chars"
    )
