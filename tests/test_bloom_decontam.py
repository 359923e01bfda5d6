"""decontam_bloom_prefilter: the Bloom screen must be invisible in the
final answer (exact verify removes every false positive) and the bitmap
math must actually prune foreign grams."""

from __future__ import annotations

import numpy as np
import pandas as pd

from go_pulsar_elasticsearch_spark.llm.decontamination import (
    _BLOOM_K,
    _BLOOM_M,
    _bloom_positions,
    decontam_bloom_prefilter,
    decontam_ngram_overlap,
)

SF = "/root/testdata/sf0.001"


def _key(rows):
    return sorted((r.doc_id, r.n_leaked_grams) for r in rows)


def test_bloom_path_equals_plain_overlap(spark):
    fast = _key(decontam_bloom_prefilter(spark, SF).collect())
    plain = _key(decontam_ngram_overlap(spark, SF).collect())
    assert fast == plain and plain, "bloom+verify must reproduce the exact op"


def test_bloom_positions_deterministic_and_in_range():
    h1 = pd.Series([1, -5, 2**62, -(2**62)], dtype="int64")
    h2 = pd.Series([7, 11, -13, 17], dtype="int64")
    pos_a = _bloom_positions(h1, h2)
    pos_b = _bloom_positions(h1, h2)
    assert len(pos_a) == _BLOOM_K
    for a, b in zip(pos_a, pos_b):
        assert (a == b).all()
        assert (a >= 0).all() and (a < _BLOOM_M).all()


def test_bloom_bitmap_prunes_foreign_grams():
    rng = np.random.default_rng(7)
    member_h1 = pd.Series(rng.integers(-(2**63), 2**63, 5000), dtype="int64")
    member_h2 = pd.Series(rng.integers(-(2**63), 2**63, 5000), dtype="int64")
    bloom = np.zeros(_BLOOM_M // 8, dtype=np.uint8)
    for pos in _bloom_positions(member_h1, member_h2):
        # unbuffered accumulate — duplicate byte indexes must all land
        np.bitwise_or.at(
            bloom, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
        )

    def probe(h1, h2):
        hit = np.ones(len(h1), dtype=bool)
        for pos in _bloom_positions(h1, h2):
            hit &= (bloom[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 == 1
        return hit

    # every member must hit (no false negatives — the Bloom contract)
    assert probe(member_h1, member_h2).all()
    # foreign probes almost all miss at this fill factor
    foreign_h1 = pd.Series(rng.integers(-(2**63), 2**63, 5000), dtype="int64")
    foreign_h2 = pd.Series(rng.integers(-(2**63), 2**63, 5000), dtype="int64")
    fp_rate = probe(foreign_h1, foreign_h2).mean()
    assert fp_rate < 0.01, fp_rate
