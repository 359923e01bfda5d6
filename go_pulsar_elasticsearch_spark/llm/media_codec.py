"""Dependency-free media codecs for uncompressed formats: BMP (24-bit
BITMAPINFOHEADER) and WAV (RIFF/PCM 16-bit).

These replace the multimodal decode stub for the two container formats
that need no codec library — pure struct parsing over the public file
formats (BMP: Windows BITMAPFILEHEADER + BITMAPINFOHEADER; WAV: RIFF
chunks + PCM fmt).  `multimodal_decode` (llm/multimodal.py) certifies
both against a DuckDB oracle computing the same channel/sample
statistics from the generating arithmetic — a broken parser (wrong
offset, missed row padding, bad chunk walk) cannot hash-match because
every output value passes through real encoded bytes.

Encoders exist so tests and the certified query can synthesize
spec-conformant payloads; golden byte fixtures in
tests/test_multimodal.py pin both codecs to the published layouts so an
encoder/decoder bug pair cannot cancel out.
"""

from __future__ import annotations

import struct


class MediaFormatError(ValueError):
    """Payload does not parse as the claimed container format."""


# --------------------------------------------------------------------------
# BMP — 24-bit uncompressed, BITMAPINFOHEADER, bottom-up rows, BGR order,
# rows padded to 4-byte boundaries (the classic Windows DIB layout)
# --------------------------------------------------------------------------


def encode_bmp(width: int, height: int, rgb_rows: list[list[tuple[int, int, int]]]) -> bytes:
    """rgb_rows[y][x] = (r, g, b) with y=0 the TOP row (the encoder
    writes rows bottom-up as the format requires)."""
    if len(rgb_rows) != height or any(len(r) != width for r in rgb_rows):
        raise ValueError("pixel grid does not match width/height")
    row_stride = (width * 3 + 3) & ~3  # pad to 4 bytes
    pad = b"\x00" * (row_stride - width * 3)
    pixel_bytes = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        for r, g, b in rgb_rows[y]:
            pixel_bytes += bytes((b, g, r))  # BGR on disk
        pixel_bytes += pad
    data_offset = 14 + 40
    file_size = data_offset + len(pixel_bytes)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info = struct.pack(
        "<IiiHHIIiiII",
        40,          # biSize
        width, height,
        1,           # biPlanes
        24,          # biBitCount
        0,           # biCompression = BI_RGB
        len(pixel_bytes),
        2835, 2835,  # 72 DPI
        0, 0,
    )
    return header + info + bytes(pixel_bytes)


def decode_bmp(data: bytes) -> dict:
    """Parse a 24-bit uncompressed BMP; returns width, height, n_pixels
    and EXACT per-channel byte sums (sum_r/g/b) — integer facts an
    oracle can recompute.  Handles bottom-up AND top-down (negative
    height) images and row padding."""
    if len(data) < 54 or data[:2] != b"BM":
        raise MediaFormatError("not a BMP payload (missing 'BM' magic)")
    magic, _file_size, _r1, _r2, data_offset = struct.unpack_from("<2sIHHI", data, 0)
    (
        bi_size, width, height_raw, planes, bpp, compression,
        _img_size, _xppm, _yppm, _clr_used, _clr_imp,
    ) = struct.unpack_from("<IiiHHIIiiII", data, 14)
    if bi_size < 40:
        raise MediaFormatError(f"unsupported DIB header size {bi_size}")
    if bpp != 24 or compression != 0:
        raise MediaFormatError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    height = abs(height_raw)
    row_stride = (width * 3 + 3) & ~3
    need = data_offset + row_stride * height
    if len(data) < need:
        raise MediaFormatError(
            f"truncated BMP: need {need} bytes, have {len(data)}"
        )
    sum_r = sum_g = sum_b = 0
    for row in range(height):
        off = data_offset + row * row_stride
        rowbytes = data[off:off + width * 3]
        # BGR triplets; slice-stride sums keep this O(n) in C
        sum_b += sum(rowbytes[0::3])
        sum_g += sum(rowbytes[1::3])
        sum_r += sum(rowbytes[2::3])
    return {
        "width": width,
        "height": height,
        "n_pixels": width * height,
        "sum_r": sum_r,
        "sum_g": sum_g,
        "sum_b": sum_b,
        "top_down": height_raw < 0,
    }


# --------------------------------------------------------------------------
# WAV — RIFF container, PCM (audioFormat=1), 16-bit little-endian samples
# --------------------------------------------------------------------------


def encode_wav(sample_rate: int, samples: list[int], n_channels: int = 1) -> bytes:
    """16-bit PCM mono/interleaved WAV from int samples in [-32768, 32767]."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, n_channels, sample_rate,
        byte_rate, block_align, 16,
    )
    data_chunk = struct.pack("<4sI", b"data", len(data)) + data
    riff_size = 4 + len(fmt) + len(data_chunk)
    return struct.pack("<4sI4s", b"RIFF", riff_size, b"WAVE") + fmt + data_chunk


def _parse_wav_chunks(data: bytes) -> tuple[int, int, bytes]:
    """Shared RIFF walk for the WAV decoders: validates the container,
    walks the chunk list (skipping unknown chunks, word-aligned), and
    returns (n_channels, sample_rate, pcm_bytes) for 16-bit PCM."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise MediaFormatError("not a RIFF/WAVE payload")
    pos = 12
    fmt_info = None
    pcm = None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise MediaFormatError("fmt chunk too short")
            audio_fmt, n_ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or bits != 16:
                raise MediaFormatError(
                    f"only 16-bit PCM supported (fmt={audio_fmt}, bits={bits})"
                )
            fmt_info = (n_ch, rate)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_info is None or pcm is None:
        raise MediaFormatError("missing fmt or data chunk")
    return fmt_info[0], fmt_info[1], pcm


def decode_wav(data: bytes) -> dict:
    """Parse a RIFF/PCM WAV (shared chunk walk in _parse_wav_chunks);
    returns exact integer sample statistics."""
    n_ch, rate, pcm = _parse_wav_chunks(data)
    n = len(pcm) // 2
    samples = struct.unpack(f"<{n}h", pcm[: n * 2])
    return {
        "n_channels": n_ch,
        "sample_rate": rate,
        "bits_per_sample": 16,
        "n_samples": n // n_ch,
        "sum_abs": sum(abs(s) for s in samples),
        "peak_abs": max((abs(s) for s in samples), default=0),
    }


def decode_bmp_pixels(data: bytes) -> dict:
    """Parse a 24-bit uncompressed BMP into the full pixel grid:
    returns width, height, and rgb_rows[y][x] = (r, g, b) with y=0 the
    TOP row regardless of on-disk row order (bottom-up or top-down).
    Same header validation as decode_bmp; used by the perceptual-hash
    operators, which need pixel access rather than channel sums."""
    if len(data) < 54 or data[:2] != b"BM":
        raise MediaFormatError("not a BMP payload (missing 'BM' magic)")
    _magic, _file_size, _r1, _r2, data_offset = struct.unpack_from(
        "<2sIHHI", data, 0
    )
    (
        bi_size, width, height_raw, _planes, bpp, compression,
        _img_size, _xppm, _yppm, _clr_used, _clr_imp,
    ) = struct.unpack_from("<IiiHHIIiiII", data, 14)
    if bi_size < 40:
        raise MediaFormatError(f"unsupported DIB header size {bi_size}")
    if bpp != 24 or compression != 0:
        raise MediaFormatError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    height = abs(height_raw)
    top_down = height_raw < 0
    row_stride = (width * 3 + 3) & ~3
    need = data_offset + row_stride * height
    if len(data) < need:
        raise MediaFormatError(
            f"truncated BMP: need {need} bytes, have {len(data)}"
        )
    rows = []
    for disk_row in range(height):
        off = data_offset + disk_row * row_stride
        rowbytes = data[off:off + width * 3]
        rows.append(
            [
                (rowbytes[3 * x + 2], rowbytes[3 * x + 1], rowbytes[3 * x])
                for x in range(width)
            ]
        )
    if not top_down:
        rows.reverse()  # bottom-up on disk -> top-row-first grid
    return {"width": width, "height": height, "rgb_rows": rows}


def decode_wav_samples(data: bytes) -> dict:
    """Parse a RIFF/PCM WAV into the raw sample list (16-bit signed,
    interleaved if multi-channel): returns n_channels, sample_rate, and
    samples.  Shares the chunk walk and validation with decode_wav via
    _parse_wav_chunks; used by the audio-fingerprint operators, which
    need sample access rather than aggregate statistics."""
    n_ch, rate, pcm = _parse_wav_chunks(data)
    n = len(pcm) // 2
    return {
        "n_channels": n_ch,
        "sample_rate": rate,
        "samples": list(struct.unpack(f"<{n}h", pcm[: n * 2])),
    }
