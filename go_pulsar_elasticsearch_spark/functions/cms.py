"""Count-min sketch interop: parse / merge / probe Spark's CMS binaries
in Python.

Spark's ``count_min_sketch`` SQL aggregate emits
``org.apache.spark.util.sketch.CountMinSketch`` in its serialized form
(stream-lib lineage).  The layout is self-describing — the per-row hash
coefficients ``hashA`` are IN the bytes — so partial sketches computed
JVM-side can be merged and probed by executor-side Python with no JVM
round-trip and no reimplementation of the seeding:

    version   int32   (1)
    total     int64   total added count
    depth     int32
    width     int32
    hashA     int64[depth]      (from Random(seed); serialized, so we
                                 never need Java's Random)
    table     int64[depth][width]

(all big-endian, java.io.DataOutputStream).  Row hash for a long item:

    h = hashA[i] * item          (64-bit wrapping)
    h += h >> 32                 (arithmetic shift)
    idx = (h & 0x7FFFFFFF) % width

``estimate = min_i table[i][idx_i]``; ``merge`` is element-wise table
addition (+ total) and requires equal (depth, width, hashA) — i.e. the
same (eps, confidence, seed) at every partial site, which the operator
pins as literals.

Verified against the JVM in tests/test_cms.py: estimates equal
``estimateCount`` and the Python merge equals ``mergeInPlace``
bit-for-bit.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_M64 = (1 << 64) - 1
_HEADER = struct.Struct(">iqii")


@dataclass
class Cms:
    total: int
    depth: int
    width: int
    hash_a: list[int]
    table: list[list[int]]  # [depth][width], non-negative counts


def parse(b: bytes) -> Cms:
    version, total, depth, width = _HEADER.unpack_from(b, 0)
    if version != 1:
        raise ValueError(f"unsupported CountMinSketch version {version}")
    off = _HEADER.size
    hash_a = list(struct.unpack_from(f">{depth}q", b, off))
    off += 8 * depth
    table = []
    for i in range(depth):
        table.append(list(struct.unpack_from(f">{width}q", b, off)))
        off += 8 * width
    return Cms(total, depth, width, hash_a, table)


def serialize(s: Cms) -> bytes:
    out = [_HEADER.pack(1, s.total, s.depth, s.width)]
    out.append(struct.pack(f">{s.depth}q", *s.hash_a))
    for row in s.table:
        out.append(struct.pack(f">{s.width}q", *row))
    return b"".join(out)


def merge(sketches: list[Cms]) -> Cms:
    first = sketches[0]
    for s in sketches[1:]:
        if (s.depth, s.width, s.hash_a) != (
            first.depth,
            first.width,
            first.hash_a,
        ):
            raise ValueError("incompatible sketches (eps/confidence/seed)")
    table = [
        [sum(s.table[i][j] for s in sketches) for j in range(first.width)]
        for i in range(first.depth)
    ]
    return Cms(
        sum(s.total for s in sketches),
        first.depth,
        first.width,
        first.hash_a,
        table,
    )


def _row_index(hash_a_i: int, item: int, width: int) -> int:
    h = (hash_a_i * item) & _M64
    if h >= 1 << 63:  # reinterpret as signed for the arithmetic shift
        h -= 1 << 64
    h += h >> 32
    return (h & 0x7FFFFFFF) % width


def estimate_long(s: Cms, item: int) -> int:
    return min(
        s.table[i][_row_index(s.hash_a[i], item, s.width)]
        for i in range(s.depth)
    )
