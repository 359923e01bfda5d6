"""Property-based tests (hypothesis) for the round-4 pure-Python
primitives: BPE losslessness, perceptual-band pigeonhole, media codec
round-trips, and the cross-engine md5-u32 fold.  These hold for ANY
input, not just the fixtures — driver-free (no Spark session needed
except where noted)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from go_pulsar_elasticsearch_spark.llm.bpe import encode_word, train_bpe
from go_pulsar_elasticsearch_spark.llm.media_codec import (
    decode_bmp_pixels,
    decode_wav_samples,
    encode_bmp,
    encode_wav,
)

_SETTINGS = settings(max_examples=50, deadline=None)

words = st.text(
    alphabet=st.characters(min_codepoint=97, max_codepoint=122),
    min_size=1,
    max_size=12,
)


@_SETTINGS
@given(st.lists(st.tuples(words, st.integers(1, 50)), min_size=1, max_size=12))
def test_bpe_encode_is_lossless_and_bounded(histogram):
    hist = sorted(dict(histogram).items())
    merges = train_bpe(hist, n_merges=8)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in hist:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w
        assert 1 <= len(toks) <= len(w)


@_SETTINGS
@given(st.lists(st.tuples(words, st.integers(1, 50)), min_size=1, max_size=10))
def test_bpe_training_deterministic_under_input_order(histogram):
    hist = dict(histogram)
    a = train_bpe(sorted(hist.items()), n_merges=6)
    b = train_bpe(sorted(hist.items(), reverse=True), n_merges=6)
    # merge list depends only on the histogram CONTENT (ties broken
    # lexicographically), not input ordering
    assert a == b


@_SETTINGS
@given(
    st.integers(1, 12),
    st.integers(1, 12),
    st.integers(0, 2**31),
)
def test_bmp_pixel_roundtrip_any_grid(w, h, seed):
    grid = [
        [((seed + 3 * x + 7 * y) % 256, (seed + x) % 256, (seed + y) % 256)
         for x in range(w)]
        for y in range(h)
    ]
    parsed = decode_bmp_pixels(encode_bmp(w, h, grid))
    assert parsed["rgb_rows"] == grid


@_SETTINGS
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=64),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_sample_roundtrip_any_samples(samples, rate):
    parsed = decode_wav_samples(encode_wav(rate, samples))
    assert parsed["samples"] == samples
    assert parsed["sample_rate"] == rate


@_SETTINGS
@given(st.lists(st.integers(0, 1), min_size=64, max_size=64),
       st.lists(st.integers(0, 1), min_size=64, max_size=64))
def test_interleaved_band_pigeonhole(bits_a, bits_b):
    """For ANY pair of 64-bit fingerprints within Hamming distance 3,
    at least one interleaved (k % 4) band must agree exactly — the
    losslessness the perceptual ops' candidate join relies on."""
    hamming = sum(x != y for x, y in zip(bits_a, bits_b))
    words_a = [
        sum(bits_a[4 * m + j] << m for m in range(16)) for j in range(4)
    ]
    words_b = [
        sum(bits_b[4 * m + j] << m for m in range(16)) for j in range(4)
    ]
    agree = sum(wa == wb for wa, wb in zip(words_a, words_b))
    if hamming <= 3:
        assert agree >= 1
    # and band agreement never under-reports: equal fingerprints agree
    # on every band
    if hamming == 0:
        assert agree == 4


@_SETTINGS
@given(st.integers(0, 2**62))
def test_md5_u32_fold_matches_int_conversion(doc_id):
    """The 8-hex-digit fold used by weighted_sample_wor's DuckDB oracle
    equals int(md5_prefix, 16) — the value Spark's conv() computes."""
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    hexd = "0123456789abcdef"
    folded = sum(
        (hexd.index(h[i])) * 16 ** (7 - i) for i in range(8)
    )
    assert folded == int(h[:8], 16)


# ---------------------------------------------------------------- CMS codec

from go_pulsar_elasticsearch_spark.functions import cms as _cms


def _mk_sketch(depth, width, hash_a, items):
    """Pure-Python CMS add (the test's independent model of the JVM
    aggregate): one counter bump per row at the shared index rule."""
    table = [[0] * width for _ in range(depth)]
    for it in items:
        for i in range(depth):
            table[i][_cms._row_index(hash_a[i], it, width)] += 1
    return _cms.Cms(len(items), depth, width, list(hash_a), table)


cms_shapes = st.tuples(
    st.integers(1, 5),                      # depth
    st.integers(1, 64),                     # width
    st.lists(st.integers(1, 2**31 - 1), min_size=5, max_size=5),
)
cms_items = st.lists(
    st.integers(-(2**62), 2**62), min_size=0, max_size=60
)


@_SETTINGS
@given(cms_shapes, cms_items)
def test_cms_serialize_parse_round_trip(shape, items):
    depth, width, hash_a = shape
    s = _mk_sketch(depth, width, hash_a[:depth], items)
    assert _cms.serialize(_cms.parse(_cms.serialize(s))) == _cms.serialize(s)


@_SETTINGS
@given(cms_shapes, cms_items, cms_items, cms_items)
def test_cms_merge_is_associative_and_commutative(shape, xs, ys, zs):
    depth, width, hash_a = shape
    a, b, c = (
        _mk_sketch(depth, width, hash_a[:depth], it) for it in (xs, ys, zs)
    )
    ab_c = _cms.merge([_cms.merge([a, b]), c])
    abc = _cms.merge([a, b, c])
    ba = _cms.merge([b, a])
    assert _cms.serialize(ab_c) == _cms.serialize(abc)
    assert _cms.serialize(ba) == _cms.serialize(_cms.merge([a, b]))


@_SETTINGS
@given(cms_shapes, cms_items)
def test_cms_estimate_never_undercounts(shape, items):
    depth, width, hash_a = shape
    s = _mk_sketch(depth, width, hash_a[:depth], items)
    for it in set(items):
        true = sum(1 for x in items if x == it)
        est = _cms.estimate_long(s, it)
        assert true <= est <= len(items)


@_SETTINGS
@given(cms_shapes, cms_items, cms_items)
def test_cms_merged_equals_single_build(shape, xs, ys):
    """Split-then-merge == one build over the concatenation — the
    mergeability contract agg_count_min's day split relies on."""
    depth, width, hash_a = shape
    a = _mk_sketch(depth, width, hash_a[:depth], xs)
    b = _mk_sketch(depth, width, hash_a[:depth], ys)
    whole = _mk_sketch(depth, width, hash_a[:depth], xs + ys)
    assert _cms.serialize(_cms.merge([a, b])) == _cms.serialize(whole)
