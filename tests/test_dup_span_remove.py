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
