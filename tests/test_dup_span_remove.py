"""dup_span_remove (round-5 VERDICT #4): corpus-duplicate spans are
excised, unique text survives verbatim — pinned on a handcrafted
doc-in-doc quote."""

from __future__ import annotations

from go_pulsar_elasticsearch_spark.llm.dedup import dup_span_remove_df

# a 12-word passage quoted verbatim inside two otherwise-unique docs
_PASSAGE = "the quick brown fox jumps over the lazy dog near riverbank tonight"
_PRE_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
_POST_A = "lambda mu nu xi omicron pi rho sigma tau upsilon"
_PRE_B = "one two three four five six seven eight nine ten"
_POST_B = "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"


def _docs(spark):
    rows = [
        (1, f"{_PRE_A} {_PASSAGE} {_POST_A}"),
        (2, f"{_PRE_B} {_PASSAGE} {_POST_B}"),
        (3, "totally unique words nobody else repeats anywhere in this corpus today friends"),
        (4, "short doc"),  # < 10 words: no grams, untouched
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_in_doc_quote_is_excised(spark):
    out = {
        r["doc_id"]: r for r in dup_span_remove_df(_docs(spark)).collect()
    }
    # the shared 12-word passage is cut from BOTH hosts; the unique
    # prefix/suffix survive verbatim and in order
    assert out[1]["cleaned_text"] == f"{_PRE_A} {_POST_A}"
    assert out[2]["cleaned_text"] == f"{_PRE_B} {_POST_B}"
    assert out[1]["n_removed"] == 12 and out[2]["n_removed"] == 12
    # unique docs and sub-gram docs are untouched
    assert out[3]["n_removed"] == 0
    assert out[3]["cleaned_text"].startswith("totally unique")
    assert out[4]["n_removed"] == 0 and out[4]["cleaned_text"] == "short doc"


def test_self_repetition_within_one_doc_is_cut(spark):
    body = "a b c d e f g h i j k l"  # 12 words, repeated twice
    df = spark.createDataFrame(
        [(1, f"{body} {body}")], "doc_id long, text string"
    )
    row = dup_span_remove_df(df).collect()[0]
    # every 10-gram inside a doubled 24-word text occurs >= twice
    # (position i and i+12 share the same words) -> everything covered
    assert row["n_removed"] == row["n_words"] == 24
    assert row["cleaned_text"] == ""


def test_counts_match_fraction_signal(spark):
    """Every word of a doc with dup_fraction == 0 must survive."""
    docs = _docs(spark)
    out = dup_span_remove_df(docs).collect()
    for r in out:
        assert 0 <= r["n_removed"] <= r["n_words"]
        kept_words = r["cleaned_text"].split(" ") if r["cleaned_text"] else []
        assert len(kept_words) == r["n_words"] - r["n_removed"]


# --------------------------------------------------------------------------
# dup_span_remove_maximal (round-7 VERDICT #4): maximal spans, merged
# --------------------------------------------------------------------------

_BLOCK50 = " ".join(f"tok{i:02d}" for i in range(50))  # 50 distinct words


def test_50_token_block_removed_as_one_span(spark):
    """The Lee-et-al. case: a 50-token block duplicated across two docs
    comes out as ONE maximal span per doc (not a scatter of 10-gram
    fragments), with exact interval bounds."""
    from go_pulsar_elasticsearch_spark.llm.dedup import (
        dup_span_remove_maximal_df,
    )

    pre_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10
    post_a = "lambda mu nu xi omicron"  # 5
    pre_b = "one two three four five six seven"  # 7
    rows = [
        (1, f"{pre_a} {_BLOCK50} {post_a}"),
        (2, f"{pre_b} {_BLOCK50}"),
        (3, "totally unique words nobody else repeats anywhere in this corpus today friends"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r for r in dup_span_remove_maximal_df(docs).collect()
    }
    assert out[1]["n_spans"] == 1 and out[1]["n_removed"] == 50
    assert out[1]["spans"] == "11-60"
    assert out[1]["cleaned_text"] == f"{pre_a} {post_a}"
    assert out[2]["n_spans"] == 1 and out[2]["n_removed"] == 50
    assert out[2]["spans"] == "8-57"
    assert out[2]["cleaned_text"] == pre_b
    assert out[3]["n_spans"] == 0 and out[3]["n_removed"] == 0
    assert out[3]["cleaned_text"].startswith("totally unique")


def test_short_duplicates_survive_maximal(spark):
    """A duplicated passage SHORTER than the minimum span length is kept
    — the exact behavior that separates this op from dup_span_remove
    (which cuts every duplicated gram regardless of run length)."""
    from go_pulsar_elasticsearch_spark.llm.dedup import (
        dup_span_remove_maximal_df,
    )

    passage = "the quick brown fox jumps over the lazy dog near riverbank tonight"  # 12 words < 20
    rows = [
        (1, f"alpha beta gamma delta epsilon zeta eta theta iota kappa {passage}"),
        (2, f"one two three four five six seven eight nine ten {passage}"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r for r in dup_span_remove_maximal_df(docs).collect()
    }
    for d in (1, 2):
        assert out[d]["n_spans"] == 0 and out[d]["n_removed"] == 0
        assert passage in out[d]["cleaned_text"]
    # dup_span_remove, by contrast, cuts it
    cut = {r["doc_id"]: r for r in dup_span_remove_df(docs).collect()}
    assert cut[1]["n_removed"] == 12


def test_nearby_blocks_merge_into_one_maximal_span(spark):
    """Two duplicated blocks whose covered intervals touch (gap < gram
    width) merge into ONE maximal span; far-apart blocks stay two."""
    from go_pulsar_elasticsearch_spark.llm.dedup import (
        dup_span_remove_maximal_df,
    )

    block_a = " ".join(f"left{i:02d}" for i in range(25))
    block_b = " ".join(f"right{i:02d}" for i in range(25))
    far_gap = " ".join(f"gapword{i:02d}" for i in range(30))
    rows = [
        # blocks adjacent -> their duplicated runs touch -> one span
        (1, f"{block_a} {block_b}"),
        # far apart -> two distinct maximal spans
        (2, f"{block_a} {far_gap} {block_b}"),
        # the second corpus copies that make a/b duplicated
        (3, f"{block_a} padding words here make this doc unique enough today"),
        (4, f"{block_b} other filler tokens keep this document distinct as well"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r for r in dup_span_remove_maximal_df(docs).collect()
    }
    assert out[1]["n_spans"] == 1 and out[1]["n_removed"] == 50
    assert out[1]["spans"] == "1-50"
    assert out[2]["n_spans"] == 2 and out[2]["n_removed"] == 50
    assert out[2]["spans"] == "1-25,56-80"
    assert out[2]["cleaned_text"] == far_gap


def test_maximal_census_is_consistent(spark):
    """Span census arithmetic: removed words = sum of interval widths =
    n_words - surviving words; intervals ordered and non-overlapping."""
    from go_pulsar_elasticsearch_spark.llm.dedup import (
        dup_span_remove_maximal_df,
    )

    docs = _docs(spark)
    for r in dup_span_remove_maximal_df(docs, min_len=10).collect():
        kept_words = r["cleaned_text"].split(" ") if r["cleaned_text"] else []
        assert len(kept_words) == r["n_words"] - r["n_removed"]
        if r["spans"]:
            ivs = [tuple(map(int, s.split("-"))) for s in r["spans"].split(",")]
            assert sum(e - s + 1 for s, e in ivs) == r["n_removed"]
            for (s1, e1), (s2, e2) in zip(ivs, ivs[1:]):
                assert e1 + 1 < s2  # maximal -> gaps strictly positive
