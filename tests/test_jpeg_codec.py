"""JPEG codec (media_codec.encode_jpeg/decode_jpeg/decode_jpeg_pixels):
the DC-exact certification invariant, lossy round-trip bounds, the
optimized-Huffman table builder (including the 16-bit length cap), the
generated zigzag against the published order, byte stuffing on real
streams, and the spec error paths.

JPEG is lossy, so unlike the PNG/GIF suites there is no byte-for-byte
pixel pin on arbitrary images; the load-bearing property is instead the
codec's determinism contract (media_codec docstring): for CONSTANT 8x8
blocks the full encode->decode chain equals an exact integer-rational
closed form — exactly what the multimodal_decode_jpeg oracle recomputes
in SQL.  If that property drifts, certification breaks before this
suite does; this suite localizes the failure.
"""

from __future__ import annotations

import math
import random

import pytest

from go_pulsar_elasticsearch_spark.llm.media_codec import (
    MediaFormatError,
    _BitReader,
    _huff_decode_tables,
    _huff_encode_map,
    _huff_read,
    _jpeg_huff_lengths,
    _JPEG_QUANT_CHROM,
    _JPEG_QUANT_LUM,
    _rgb_to_ycbcr,
    _ycbcr_to_rgb,
    _ZIGZAG,
    decode_jpeg,
    decode_jpeg_pixels,
    encode_jpeg,
    jpeg_quant_table,
)


def _dc_roundtrip(v: int, q00: int) -> int:
    """The closed form the SQL oracle mirrors."""
    c = v - 128
    dc = 8 * c
    q = math.floor(abs(dc) / q00 + 0.5) * (1 if dc >= 0 else -1)
    return min(max(int(math.floor(q * q00 / 8 + 128.5)), 0), 255)


def _mosaic(d: int, w: int, h: int):
    def col(bx, by):
        return (
            (d * 7 + 11 * bx + 13 * by) % 256,
            (d * 3 + 5 * bx + 29 * by) % 256,
            (d * 5 + 17 * bx + 3 * by) % 256,
        )

    return [[col(x // 8, y // 8) for x in range(w)] for y in range(h)], col


# --------------------------------------------------- DC-exact invariant


@pytest.mark.parametrize("quality", [50, 75, 90])
def test_constant_block_mosaic_is_dc_exact(quality):
    """Every pixel of a constant-block mosaic decodes to the closed
    form, across qualities, block-grid shapes, and (crucially)
    non-multiple-of-8 dimensions that exercise padding + cropping."""
    q0l = jpeg_quant_table(_JPEG_QUANT_LUM, quality)[0]
    q0c = jpeg_quant_table(_JPEG_QUANT_CHROM, quality)[0]
    for d in range(0, 60, 7):
        w, h = 10 + d % 23, 9 + d % 17
        grid, col = _mosaic(d, w, h)
        got = decode_jpeg_pixels(encode_jpeg(w, h, grid, quality=quality))
        assert got["width"] == w and got["height"] == h
        for y in range(h):
            for x in range(w):
                r, g, b = col(x // 8, y // 8)
                y0, cb0, cr0 = _rgb_to_ycbcr(r, g, b)
                exp = _ycbcr_to_rgb(
                    _dc_roundtrip(y0, q0l),
                    _dc_roundtrip(cb0, q0c),
                    _dc_roundtrip(cr0, q0c),
                )
                assert got["rgb_rows"][y][x] == exp, (d, x, y)


def test_decode_jpeg_sums_match_pixel_grid():
    grid, _ = _mosaic(3, 19, 13)
    data = encode_jpeg(19, 13, grid, quality=75)
    full = decode_jpeg_pixels(data)["rgb_rows"]
    sums = decode_jpeg(data)
    assert sums["n_pixels"] == 19 * 13
    for ci, key in enumerate(("sum_r", "sum_g", "sum_b")):
        assert sums[key] == sum(px[ci] for row in full for px in row)


def test_oracle_q00_literals_match_quality_scaling():
    """multimodal_decode_jpeg pins Q00=8 (lum) / 9 (chrom) at quality
    75 — re-derive them so a table or scaling change cannot silently
    diverge from the committed oracle SQL."""
    from go_pulsar_elasticsearch_spark.llm.multimodal import (
        _JPEG_Q,
        _JPEG_Q00_CHROM,
        _JPEG_Q00_LUM,
    )

    assert jpeg_quant_table(_JPEG_QUANT_LUM, _JPEG_Q)[0] == _JPEG_Q00_LUM
    assert jpeg_quant_table(_JPEG_QUANT_CHROM, _JPEG_Q)[0] == _JPEG_Q00_CHROM


# ------------------------------------------------------- lossy bounds


def test_random_image_roundtrip_bounded_error():
    rng = random.Random(11)
    w, h = 26, 18
    grid = [
        [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(w)
        ]
        for _ in range(h)
    ]
    got = decode_jpeg_pixels(encode_jpeg(w, h, grid, quality=90))
    assert got["width"] == w and got["height"] == h
    worst = max(
        abs(got["rgb_rows"][y][x][c] - grid[y][x][c])
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    # random noise is JPEG's worst case; q90 4:4:4 stays well inside
    # +/-48 per channel (observed ~26) — the bound catches gross bugs
    # (swapped channels, block misplacement), not codec regressions
    assert worst <= 48


def test_smooth_gradient_high_fidelity():
    w, h = 24, 16
    grid = [
        [(x * 8 % 256, (x + y) * 5 % 256, y * 9 % 256) for x in range(w)]
        for y in range(h)
    ]
    got = decode_jpeg_pixels(encode_jpeg(w, h, grid, quality=90))
    worst = max(
        abs(got["rgb_rows"][y][x][c] - grid[y][x][c])
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    assert worst <= 10


def test_grayscale_single_component():
    w, h = 20, 9
    grid = [[(v * 12 % 256,) * 3 for v in range(w)] for _ in range(h)]
    got = decode_jpeg_pixels(encode_jpeg(w, h, grid, quality=85, gray=True))
    assert got["width"] == w and got["height"] == h
    for row in got["rgb_rows"]:
        for r, g, b in row:
            assert r == g == b  # Y replicated into all channels


# ------------------------------------------ Huffman table construction


def test_optimized_huffman_roundtrips_skewed_frequencies():
    """Exponentially skewed frequencies force long codes; the K.2 cap
    keeps every length <= 16 and the canonical (encode, decode) pair
    must stay mutually inverse symbol-for-symbol."""
    freq = {s: 1 << min(s, 30) for s in range(24)}
    bits, huffval = _jpeg_huff_lengths(freq)
    assert sum(bits) == len(huffval) == len(freq)
    assert len(bits) == 16  # capped
    # Kraft: a prefix-complete code fits exactly
    assert sum(n * 2 ** (16 - l) for l, n in enumerate(bits, 1)) <= 2**16
    enc = _huff_encode_map(bits, huffval)
    dec = _huff_decode_tables(bits, huffval)
    stream = bytearray()
    acc, n = 0, 0
    symbols = sorted(freq) * 3
    for s in symbols:
        code, ln = enc[s]
        acc = (acc << ln) | code
        n += ln
        while n >= 8:
            n -= 8
            stream.append((acc >> n) & 0xFF)
    if n:
        stream.append(((acc << (8 - n)) | ((1 << (8 - n)) - 1)) & 0xFF)
    r = _BitReader(bytes(stream))
    for s in symbols:
        assert _huff_read(r, dec) == s


def test_zigzag_matches_published_order():
    """First entries of the T.81 zigzag, transcribed independently of
    the generator."""
    assert _ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    assert len(_ZIGZAG) == 64 and len(set(_ZIGZAG)) == 64
    assert _ZIGZAG[-1] == (7, 7)


def test_byte_stuffing_occurs_and_decodes():
    """At least one encoded image in a sweep contains a stuffed 0xFF00
    inside the entropy segment, and every such image still decodes —
    unstuffing is exercised on real streams, not synthetic ones."""
    rng = random.Random(5)
    stuffed = 0
    for _ in range(30):
        w, h = 17, 11
        grid = [
            [
                (rng.randrange(256), rng.randrange(256), rng.randrange(256))
                for _ in range(w)
            ]
            for _ in range(h)
        ]
        data = encode_jpeg(w, h, grid, quality=95)
        body = data[2:-2]  # strip SOI/EOI before searching
        if b"\xff\x00" in body:
            stuffed += 1
        got = decode_jpeg_pixels(data)
        assert got["width"] == w and got["height"] == h
    assert stuffed > 0


# ------------------------------------------------------- error paths


def test_rejects_non_jpeg():
    with pytest.raises(MediaFormatError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnot a jpeg")


def test_rejects_progressive_sof():
    grid, _ = _mosaic(1, 10, 10)
    data = bytearray(encode_jpeg(10, 10, grid))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(MediaFormatError):
        decode_jpeg(bytes(data))


def test_rejects_truncated_entropy():
    grid, _ = _mosaic(2, 24, 24)
    data = encode_jpeg(24, 24, grid)
    with pytest.raises(MediaFormatError):
        decode_jpeg(data[: len(data) // 2])


def test_rejects_bad_dimensions():
    with pytest.raises(MediaFormatError):
        encode_jpeg(0, 1, [])


# ---------------------------------------------- r9 batched-DCT parity


def test_fdct_quant_plane_matches_per_block():
    """The r9 batched plane FDCT (_fdct_quant_plane) must be
    coefficient-for-coefficient identical to the per-block numpy path
    it replaced, on random non-multiple-of-8 planes (padding rows and
    columns exercised)."""
    import numpy as np

    from go_pulsar_elasticsearch_spark.llm.media_codec import (
        _fdct_quant,
        _fdct_quant_plane,
        _jpeg_component_blocks,
        jpeg_quant_table,
        _JPEG_QUANT_LUM,
    )

    rng = np.random.default_rng(5)
    for w, h in [(10, 9), (8, 8), (33, 17), (1, 1), (25, 8)]:
        plane = [[int(v) for v in rng.integers(0, 256, w)] for _ in range(h)]
        qtab = jpeg_quant_table(_JPEG_QUANT_LUM, 75)
        batched = _fdct_quant_plane(plane, w, h, qtab)
        loop = [
            _fdct_quant(b, qtab)
            for b in _jpeg_component_blocks(plane, w, h)
        ]
        assert batched == loop, (w, h)


def test_color_transform_planes_match_scalar():
    """The r9 vectorized color transforms must be bit-identical to the
    scalar per-pixel forms in both directions."""
    import numpy as np

    from go_pulsar_elasticsearch_spark.llm.media_codec import (
        _rgb_to_ycbcr,
        _rgb_to_ycbcr_planes,
        _ycbcr_to_rgb,
        _ycbcr_to_rgb_planes,
    )

    rng = np.random.default_rng(11)
    h, w = 19, 23
    grid = [
        [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(w)]
        for _ in range(h)
    ]
    ny, ncb, ncr = _rgb_to_ycbcr_planes(grid, w, h)
    for y in range(h):
        for x in range(w):
            assert (ny[y][x], ncb[y][x], ncr[y][x]) == _rgb_to_ycbcr(
                *grid[y][x]
            )
    r, g, b = _ycbcr_to_rgb_planes(ny, ncb, ncr)
    for y in range(h):
        for x in range(w):
            assert (
                int(r[y][x]),
                int(g[y][x]),
                int(b[y][x]),
            ) == _ycbcr_to_rgb(ny[y][x], ncb[y][x], ncr[y][x])
