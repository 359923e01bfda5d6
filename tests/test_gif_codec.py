"""GIF codec (media_codec.encode_gif/decode_gif/decode_gif_pixels):
real LZW round-trips (variable code width, dictionary growth + clear,
the KwKwK case, the end-of-stream width off-by-one), golden byte
fixture pinning the on-disk layout, and the spec error paths.

Unlike PNG (where DEFLATE output varies across zlib builds), GIF LZW
output is fully determined by this module's own compressor, so the
golden fixture pins ENCODER bytes too.
"""

from __future__ import annotations

import random

import pytest

from go_pulsar_elasticsearch_spark.llm.media_codec import (
    MediaFormatError,
    _lzw_compress,
    _lzw_decompress,
    decode_gif,
    decode_gif_pixels,
    encode_gif,
)

_GOLD_PALETTE = [(255, 0, 10), (0, 128, 20), (7, 7, 7)]
_GOLD_GRID = [[0, 1, 2], [2, 1, 0]]
_GOLD = bytes.fromhex(
    "47494638396103000200810000ff000a0080140707070000002c0000000003000200"
    "00020444240105003b"
)


def test_golden_bytes_and_decode():
    assert encode_gif(3, 2, _GOLD_PALETTE, _GOLD_GRID) == _GOLD
    assert _GOLD[:6] == b"GIF89a"
    d = decode_gif(_GOLD)
    assert d == {
        "width": 3, "height": 2, "n_pixels": 6,
        "n_colors": 4,  # 3-color palette padded to the 4-entry GCT
        "sum_r": 2 * (255 + 0 + 7),
        "sum_g": 2 * (0 + 128 + 7),
        "sum_b": 2 * (10 + 20 + 7),
    }
    px = decode_gif_pixels(_GOLD)
    assert px["rgb_rows"] == [
        [_GOLD_PALETTE[i] for i in row] for row in _GOLD_GRID
    ]


def test_lzw_roundtrip_sweep():
    """Every (length, min-code-size) shape up to the width-bump and
    end-of-stream boundaries round-trips exactly — this sweep is what
    caught the END-code width off-by-one during development."""
    rng = random.Random(1)
    for n in range(1, 40):
        for _ in range(50):
            mcs = rng.choice([2, 3, 4, 8])
            idx = [rng.randrange(1 << mcs) for _ in range(n)]
            assert _lzw_decompress(_lzw_compress(idx, mcs), mcs) == idx


def test_lzw_dictionary_overflow_clears():
    """A stream long and varied enough to fill the 4096-entry
    dictionary forces the mid-stream CLEAR path on both sides."""
    grid = [[(x * x + 3 * y) % 4 for x in range(200)] for y in range(150)]
    palette = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (1, 2, 3)]
    data = encode_gif(200, 150, palette, grid)
    assert decode_gif_pixels(data)["rgb_rows"] == [
        [palette[i] for i in row] for row in grid
    ]


def test_roundtrip_random_palettes():
    rng = random.Random(11)
    for _ in range(100):
        w, h = rng.randint(1, 40), rng.randint(1, 25)
        ncol = rng.choice([2, 3, 4, 7, 8, 16, 100, 256])
        palette = [
            tuple(rng.randrange(256) for _ in range(3)) for _ in range(ncol)
        ]
        grid = [[rng.randrange(ncol) for _ in range(w)] for _ in range(h)]
        d = decode_gif(encode_gif(w, h, palette, grid))
        for c, ch in enumerate("rgb"):
            assert d[f"sum_{ch}"] == sum(
                palette[i][c] for row in grid for i in row
            )


def test_extensions_are_skipped():
    """A GIF89a graphic-control extension between the GCT and the image
    descriptor is walked over per spec."""
    data = encode_gif(2, 1, [(1, 2, 3), (4, 5, 6)], [[0, 1]])
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # label+4-byte block+term
    spliced = data[:13 + 6] + gce + data[13 + 6:]
    assert decode_gif(spliced) == decode_gif(data)


def test_error_paths():
    with pytest.raises(MediaFormatError, match="signature"):
        decode_gif(b"not a gif")
    data = encode_gif(2, 2, [(0, 0, 0), (9, 9, 9)], [[0, 1], [1, 0]])
    with pytest.raises(MediaFormatError):
        decode_gif(data[:15])  # truncated before any image block
    # interlace flag set -> explicit rejection
    bad = bytearray(data)
    desc = data.index(b"\x2c")
    bad[desc + 9] |= 0x40
    with pytest.raises(MediaFormatError, match="interlaced"):
        decode_gif(bytes(bad))
    # trailer with no image
    with pytest.raises(MediaFormatError, match="no image"):
        decode_gif(data[:13 + 6] + b"\x3b")


def test_encoder_validates_inputs():
    with pytest.raises(ValueError, match="index grid"):
        encode_gif(2, 1, [(0, 0, 0), (1, 1, 1)], [[0]])
    with pytest.raises(ValueError, match="palette"):
        encode_gif(1, 1, [(0, 0, 0)], [[0]])
    with pytest.raises(ValueError, match="beyond palette"):
        encode_gif(1, 1, [(0, 0, 0), (1, 1, 1)], [[5]])


def test_decode_payload_routes_gif():
    from go_pulsar_elasticsearch_spark.llm.multimodal import decode_payload

    assert decode_payload(_GOLD, "image/gif")["n_pixels"] == 6
