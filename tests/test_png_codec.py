"""PNG codec (media_codec.encode_png/decode_png/decode_png_pixels):
round-trip properties over every filter type and both color types,
golden byte fixtures pinning the on-disk layout, and the spec error
paths (signature, CRC, truncation, unsupported subsets).

The golden fixtures store FULL encoded bytes (decode-side pin: a chunk
walk / inflate / unfilter regression fails against frozen bytes); the
encoder layout test instead inspects the signature, IHDR fields, and
the DECOMPRESSED filtered scanlines — compressed IDAT bytes are not
pinned because DEFLATE output may differ across zlib builds while
remaining spec-valid.
"""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from go_pulsar_elasticsearch_spark.llm.media_codec import (
    MediaFormatError,
    decode_png,
    decode_png_pixels,
    encode_png,
)

# 3x2 RGB, filter types [1 (Sub), 4 (Paeth)]
_GOLD_RGB_GRID = [
    [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    [(15, 25, 35), (45, 55, 65), (75, 85, 95)],
]
_GOLD_RGB = bytes.fromhex(
    "89504e470d0a1a0a0000000d49484452000000030000000208020000001216f14d"
    "0000001149444154789c63e41291830016561800000ed30123aa45bed000000000"
    "49454e44ae426082"
)

# 2x2 RGBA, filter types [2 (Up), 3 (Average)]
_GOLD_RGBA_GRID = [
    [(1, 2, 3, 4), (250, 251, 252, 253)],
    [(9, 8, 7, 6), (128, 129, 130, 131)],
]
_GOLD_RGBA = bytes.fromhex(
    "89504e470d0a1a0a0000000d494844520000000200000002080600000072b60d24"
    "0000001a49444154789c6362646266f9f5fbcf5f664e763696ff0c8c4c0032c405"
    "1a612372a00000000049454e44ae426082"
)


def test_golden_rgb_decode():
    d = decode_png(_GOLD_RGB)
    assert d == {
        "width": 3, "height": 2, "n_pixels": 6, "n_channels": 3,
        "sum_r": 255, "sum_g": 315, "sum_b": 375,
    }
    px = decode_png_pixels(_GOLD_RGB)
    assert px["rgb_rows"] == _GOLD_RGB_GRID


def test_golden_rgba_decode():
    d = decode_png(_GOLD_RGBA)
    assert d == {
        "width": 2, "height": 2, "n_pixels": 4, "n_channels": 4,
        "sum_r": 388, "sum_g": 390, "sum_b": 392, "sum_a": 394,
    }
    # pixel grid drops alpha (luma-only consumers)
    px = decode_png_pixels(_GOLD_RGBA)
    assert px["rgb_rows"] == [
        [p[:3] for p in row] for row in _GOLD_RGBA_GRID
    ]


def test_encoder_layout():
    """Signature, IHDR field bytes, and the decompressed filtered
    scanline stream are spec-exact (the parts of the layout that are
    deterministic across zlib builds)."""
    grid = [[(5, 6, 7), (8, 9, 10)]]
    data = encode_png(2, 1, grid, [1])
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    length, ctype = struct.unpack_from(">I4s", data, 8)
    assert (length, ctype) == (13, b"IHDR")
    w, h, depth, color, comp, filt, inter = struct.unpack_from(
        ">IIBBBBB", data, 16
    )
    assert (w, h, depth, color, comp, filt, inter) == (2, 1, 8, 2, 0, 0, 0)
    # IHDR CRC covers type+body
    (crc,) = struct.unpack_from(">I", data, 16 + 13)
    assert crc == zlib.crc32(data[12:16 + 13]) & 0xFFFFFFFF
    # IDAT inflates to: filter byte 1 (Sub), raw first pixel, then
    # second pixel minus first, byte-wise mod 256
    idat_len, idat_type = struct.unpack_from(">I4s", data, 33)
    assert idat_type == b"IDAT"
    raw = zlib.decompress(data[41:41 + idat_len])
    assert raw == bytes([1, 5, 6, 7, 3, 3, 3])
    assert data[-12:] == (
        struct.pack(">I", 0) + b"IEND"
        + struct.pack(">I", zlib.crc32(b"IEND") & 0xFFFFFFFF)
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_roundtrip_each_filter_type(ftype):
    rng = random.Random(100 + ftype)
    w, h = 9, 6
    grid = [
        [tuple(rng.randrange(256) for _ in range(3)) for _ in range(w)]
        for _ in range(h)
    ]
    data = encode_png(w, h, grid, [ftype] * h)
    assert decode_png_pixels(data)["rgb_rows"] == grid


def test_roundtrip_random_mixed():
    """200 random images: size, color type, and per-row filter type all
    vary — byte-exact pixel recovery every time."""
    rng = random.Random(7)
    for _ in range(200):
        w, h = rng.randint(1, 17), rng.randint(1, 11)
        nch = rng.choice([3, 4])
        grid = [
            [tuple(rng.randrange(256) for _ in range(nch)) for _ in range(w)]
            for _ in range(h)
        ]
        fts = [rng.randrange(5) for _ in range(h)]
        data = encode_png(w, h, grid, fts)
        got = decode_png_pixels(data)["rgb_rows"]
        assert got == [[p[:3] for p in row] for row in grid]
        d = decode_png(data)
        assert d["n_channels"] == nch
        for i, ch in enumerate("rgb"):
            assert d[f"sum_{ch}"] == sum(p[i] for row in grid for p in row)
        if nch == 4:
            assert d["sum_a"] == sum(p[3] for row in grid for p in row)


def test_ancillary_chunks_skipped():
    """tEXt/pHYs between IHDR and IDAT are skipped per spec."""
    data = encode_png(1, 1, [[(9, 9, 9)]])
    body = b"Comment\x00hello"
    text = (
        struct.pack(">I", len(body)) + b"tEXt" + body
        + struct.pack(">I", zlib.crc32(b"tEXt" + body) & 0xFFFFFFFF)
    )
    spliced = data[:33] + text + data[33:]
    assert decode_png(spliced)["sum_r"] == 9


def test_multiple_idat_chunks_concatenated():
    """A zlib stream split across several IDAT chunks (spec-legal and
    common) reassembles before inflate."""
    data = encode_png(2, 2, [[(1, 2, 3)] * 2] * 2, [0, 2])
    idat_len, _ = struct.unpack_from(">I4s", data, 33)
    payload = data[41:41 + idat_len]
    split = max(1, len(payload) // 2)
    chunks = b""
    for part in (payload[:split], payload[split:]):
        chunks += (
            struct.pack(">I", len(part)) + b"IDAT" + part
            + struct.pack(">I", zlib.crc32(b"IDAT" + part) & 0xFFFFFFFF)
        )
    rebuilt = data[:33] + chunks + data[33 + 12 + idat_len:]
    assert decode_png(rebuilt) == decode_png(data)


def test_error_paths():
    with pytest.raises(MediaFormatError, match="bad signature"):
        decode_png(b"not a png at all")
    data = encode_png(2, 2, [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (1, 1, 1)]])
    # corrupt one IDAT byte -> CRC mismatch
    bad = bytearray(data)
    bad[44] ^= 0xFF
    with pytest.raises(MediaFormatError, match="CRC"):
        decode_png(bytes(bad))
    # truncated chunk body
    with pytest.raises(MediaFormatError):
        decode_png(data[:40])
    # missing IEND
    with pytest.raises(MediaFormatError, match="missing"):
        decode_png(data[:-12])


@pytest.mark.parametrize(
    "depth,color,interlace,msg",
    [
        (16, 2, 0, "only 8-bit"),
        (8, 3, 0, "only 8-bit"),   # palette
        (8, 0, 0, "only 8-bit"),   # grayscale
        (8, 2, 1, "interlace"),
    ],
)
def test_unsupported_subsets_rejected(depth, color, interlace, msg):
    ihdr = struct.pack(">IIBBBBB", 1, 1, depth, color, 0, 0, interlace)
    idat_body = zlib.compress(b"\x00\x00\x00\x00")
    data = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        + struct.pack(">I", len(idat_body)) + b"IDAT" + idat_body
        + struct.pack(">I", zlib.crc32(b"IDAT" + idat_body) & 0xFFFFFFFF)
        + struct.pack(">I", 0) + b"IEND"
        + struct.pack(">I", zlib.crc32(b"IEND") & 0xFFFFFFFF)
    )
    with pytest.raises(MediaFormatError, match=msg):
        decode_png(data)


def test_decode_payload_routes_png():
    from go_pulsar_elasticsearch_spark.llm.multimodal import decode_payload

    d = decode_payload(_GOLD_RGB, "image/png")
    assert d["sum_r"] == 255
    # video/mp4 now routes to the real box-walk metadata parser, so a
    # truncated header is a FORMAT error, not a missing-codec error
    from go_pulsar_elasticsearch_spark.llm.media_codec import (
        MediaFormatError,
    )

    with pytest.raises(MediaFormatError):
        decode_payload(b"\x00\x00\x00\x18ftypmp42", "video/mp4")


def test_encoder_validates_inputs():
    with pytest.raises(ValueError, match="pixel grid"):
        encode_png(2, 1, [[(0, 0, 0)]])
    with pytest.raises(ValueError, match="filter type per row"):
        encode_png(1, 1, [[(0, 0, 0)]], [0, 0])
    with pytest.raises(ValueError, match="RGB or RGBA"):
        encode_png(1, 1, [[(0, 0)]])
