"""Dependency-free media codecs: BMP (24-bit BITMAPINFOHEADER), WAV
(RIFF/PCM 16-bit), PNG (8-bit RGB/RGBA, stdlib zlib inflate +
per-scanline unfilter), and GIF (87a/89a single-frame, real
variable-code-width LZW both directions).

These replace the multimodal decode stub for the container formats
that need no external codec library — pure struct parsing over the
public file formats (BMP: Windows BITMAPFILEHEADER + BITMAPINFOHEADER;
WAV: RIFF chunks + PCM fmt; PNG: RFC 2083 chunk stream, DEFLATE via
stdlib zlib, filter types 0-4; GIF: GCT + LZW index stream in
length-prefixed sub-blocks).  The certified queries in
llm/multimodal.py check each against a DuckDB oracle computing the
same channel/sample statistics from the generating arithmetic — a
broken parser (wrong offset, missed row padding, bad chunk walk, wrong
unfilter, an LZW code-width off-by-one) cannot hash-match because
every output value passes through real encoded bytes.

Encoders exist so tests and the certified queries can synthesize
spec-conformant payloads; golden byte fixtures in
tests/test_multimodal.py, tests/test_png_codec.py, and
tests/test_gif_codec.py pin the codecs to the published layouts so an
encoder/decoder bug pair cannot cancel out.
"""

from __future__ import annotations

import struct
import zlib


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


# --------------------------------------------------------------------------
# PNG — RFC 2083: 8-byte signature, length/type/data/CRC chunks, IHDR,
# one-or-more IDAT carrying a zlib stream of filtered scanlines, IEND.
# Supported: bit depth 8, color type 2 (RGB) or 6 (RGBA), no interlace.
# Filter types 0-4 (None/Sub/Up/Average/Paeth) both encode and decode —
# the real codec surface a crawl corpus exercises.  Everything here is
# stdlib: struct for chunk framing, zlib for DEFLATE and CRC-32.
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG filter type 4): the neighbor (left/up/
    up-left) closest to the linear estimate a + b - c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_scanline(ftype: int, raw: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply PNG filter ``ftype`` to one raw scanline (encoder side)."""
    n = len(raw)
    if ftype == 0:
        return bytes(raw)
    if ftype == 1:  # Sub
        return bytes(
            (raw[i] - (raw[i - bpp] if i >= bpp else 0)) & 0xFF
            for i in range(n)
        )
    if ftype == 2:  # Up
        return bytes((raw[i] - prev[i]) & 0xFF for i in range(n))
    if ftype == 3:  # Average
        return bytes(
            (raw[i] - ((raw[i - bpp] if i >= bpp else 0) + prev[i]) // 2)
            & 0xFF
            for i in range(n)
        )
    if ftype == 4:  # Paeth
        return bytes(
            (raw[i] - _paeth(raw[i - bpp] if i >= bpp else 0, prev[i],
                             prev[i - bpp] if i >= bpp else 0)) & 0xFF
            for i in range(n)
        )
    raise ValueError(f"invalid PNG filter type {ftype}")


def _unfilter_scanline(ftype: int, line: bytearray, prev: bytes, bpp: int) -> None:
    """Reverse PNG filter ``ftype`` over one scanline IN PLACE (decoder
    side — reconstruction is sequential because Sub/Average/Paeth read
    already-reconstructed bytes of the same line)."""
    n = len(line)
    if ftype == 0:
        return
    if ftype == 1:  # Sub
        for i in range(bpp, n):
            line[i] = (line[i] + line[i - bpp]) & 0xFF
        return
    if ftype == 2:  # Up
        for i in range(n):
            line[i] = (line[i] + prev[i]) & 0xFF
        return
    if ftype == 3:  # Average
        for i in range(n):
            left = line[i - bpp] if i >= bpp else 0
            line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        return
    if ftype == 4:  # Paeth
        for i in range(n):
            left = line[i - bpp] if i >= bpp else 0
            ul = prev[i - bpp] if i >= bpp else 0
            line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        return
    raise MediaFormatError(f"invalid PNG filter type {ftype}")


def encode_png(
    width: int,
    height: int,
    rgb_rows: list[list[tuple[int, ...]]],
    filter_types: list[int] | None = None,
) -> bytes:
    """8-bit PNG from rgb_rows[y][x] = (r, g, b) or (r, g, b, a) with
    y=0 the TOP row.  ``filter_types`` (one per row, 0-4) lets tests
    and the certified corpus exercise every unfilter path; default is
    all-0 (None).  Pixel tuples must be uniformly 3- or 4-wide."""
    if len(rgb_rows) != height or any(len(r) != width for r in rgb_rows):
        raise ValueError("pixel grid does not match width/height")
    n_ch = len(rgb_rows[0][0]) if height and width else 3
    if n_ch not in (3, 4):
        raise ValueError("pixels must be RGB or RGBA tuples")
    color_type = 2 if n_ch == 3 else 6
    if filter_types is None:
        filter_types = [0] * height
    if len(filter_types) != height:
        raise ValueError("need one filter type per row")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = bytes(width * n_ch)
    for y in range(height):
        line = bytes(v & 0xFF for px in rgb_rows[y] for v in px)
        ft = filter_types[y]
        raw.append(ft)
        raw += _filter_scanline(ft, line, prev, n_ch)
        prev = line
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_walk(data: bytes) -> tuple[tuple[int, int, int, int], bytes]:
    """Shared chunk walk for the PNG decoders: validates the signature,
    CRC-checks every chunk, enforces the supported subset (bit depth 8,
    color type 2/6, compression 0, filter method 0, no interlace), and
    returns ((width, height, color_type, n_channels), inflated raw
    filtered scanlines)."""
    if len(data) < 8 or data[:8] != _PNG_SIG:
        raise MediaFormatError("not a PNG payload (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    seen_iend = False
    while pos + 8 <= len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise MediaFormatError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise MediaFormatError(f"bad CRC on {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped, per spec
        pos += 12 + length
    if ihdr is None or not idat or not seen_iend:
        raise MediaFormatError("missing IHDR, IDAT, or IEND chunk")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (2, 6):
        raise MediaFormatError(
            f"only 8-bit RGB/RGBA PNG supported (depth={depth}, "
            f"color_type={color_type})"
        )
    if comp != 0 or filt != 0:
        raise MediaFormatError("nonstandard compression/filter method")
    if interlace != 0:
        raise MediaFormatError("Adam7 interlace not supported")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise MediaFormatError(f"bad IDAT zlib stream: {exc}") from exc
    n_ch = 3 if color_type == 2 else 4
    if len(raw) != height * (1 + width * n_ch):
        raise MediaFormatError(
            f"IDAT decodes to {len(raw)} bytes, expected "
            f"{height * (1 + width * n_ch)}"
        )
    return (width, height, color_type, n_ch), raw


def _png_scanlines(data: bytes) -> tuple[int, int, int, int, list[bytearray]]:
    """Decode to reconstructed (unfiltered) scanlines."""
    (width, height, color_type, n_ch), raw = _png_walk(data)
    stride = width * n_ch
    rows: list[bytearray] = []
    prev = bytes(stride)
    for y in range(height):
        off = y * (1 + stride)
        ftype = raw[off]
        line = bytearray(raw[off + 1:off + 1 + stride])
        _unfilter_scanline(ftype, line, prev, n_ch)
        rows.append(line)
        prev = bytes(line)
    return width, height, color_type, n_ch, rows


def decode_png(data: bytes) -> dict:
    """Parse an 8-bit RGB/RGBA PNG; returns width, height, n_pixels,
    n_channels and EXACT per-channel byte sums (sum_r/g/b, plus sum_a
    for RGBA) — the same integer-fact surface as decode_bmp, so one
    oracle shape certifies both codecs."""
    width, height, color_type, n_ch, rows = _png_scanlines(data)
    sums = [0, 0, 0, 0]
    for line in rows:
        for c in range(n_ch):
            sums[c] += sum(line[c::n_ch])
    out = {
        "width": width,
        "height": height,
        "n_pixels": width * height,
        "n_channels": n_ch,
        "sum_r": sums[0],
        "sum_g": sums[1],
        "sum_b": sums[2],
    }
    if n_ch == 4:
        out["sum_a"] = sums[3]
    return out


def decode_png_pixels(data: bytes) -> dict:
    """Parse an 8-bit RGB/RGBA PNG into the full pixel grid:
    rgb_rows[y][x] = (r, g, b) with y=0 the TOP row (alpha dropped for
    RGBA — the perceptual-hash operators consume luma only, matching
    decode_bmp_pixels' surface)."""
    width, height, _color_type, n_ch, rows = _png_scanlines(data)
    grid = [
        [tuple(line[x * n_ch:x * n_ch + 3]) for x in range(width)]
        for line in rows
    ]
    return {"width": width, "height": height, "rgb_rows": grid}


# --------------------------------------------------------------------------
# GIF — GIF87a/89a: logical screen descriptor, global color table,
# image descriptor, LZW-compressed index stream in length-prefixed data
# sub-blocks.  Supported: single-frame, global color table, no
# interlace (the decoder walks and skips extension blocks, including
# GIF89a graphic-control).  Both the encoder's LZW compressor and the
# decoder's decompressor are real variable-code-width implementations
# (clear/end codes, dictionary growth to 4096) — everything stdlib.
# --------------------------------------------------------------------------


def _lzw_compress(indices: list[int], min_code_size: int) -> bytes:
    """Real GIF LZW: variable code width starting at min_code_size+1,
    dictionary growth to 4096 then CLEAR, LSB-first bit packing."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    seq: tuple[int, ...] = ()
    for px in indices:
        cand = seq + (px,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        seq = (px,)
    if seq:
        emit(table[seq], width)
        # the decoder appends one more dictionary entry after reading
        # this final data code; if that append fills the current code
        # width, it reads END at width+1 — mirror that here (the
        # classic GIF-LZW end-of-stream off-by-one)
        if next_code == (1 << width) and width < 12:
            width += 1
    emit(end, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int) -> list[int]:
    """GIF LZW decode: the canonical algorithm including the KwKwK
    case (code == next_code -> prev + prev[0])."""
    clear = 1 << min_code_size
    end = clear + 1
    pos = 0
    bitbuf = 0
    nbits = 0

    def read(width: int) -> int:
        nonlocal pos, bitbuf, nbits
        while nbits < width:
            if pos >= len(data):
                raise MediaFormatError("truncated LZW stream")
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        return code

    out: list[int] = []
    table: list[tuple[int, ...]] = []
    width = min_code_size + 1
    prev: tuple[int, ...] | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if code < len(table):
            entry = table[code]
            if not entry:  # the clear/end placeholder slots
                raise MediaFormatError("LZW code references reserved slot")
        elif prev is not None and code == len(table):
            entry = prev + (prev[0],)  # KwKwK
        else:
            raise MediaFormatError(f"LZW code {code} beyond dictionary")
        out.extend(entry)
        if prev is not None:
            table.append(prev + (entry[0],))
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def encode_gif(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    index_rows: list[list[int]],
) -> bytes:
    """Single-frame GIF89a with a global color table.  ``palette`` is
    padded to the next power of two (2..256); ``index_rows[y][x]``
    indexes into it, top row first."""
    if len(index_rows) != height or any(len(r) != width for r in index_rows):
        raise ValueError("index grid does not match width/height")
    if not 2 <= len(palette) <= 256:
        raise ValueError("palette must hold 2..256 colors")
    # smallest n with 2^(n+1) >= len(palette) (GCT sizes are powers of 2)
    n = 0
    while (2 << n) < len(palette):
        n += 1
    table_len = 2 << n
    if any(i >= len(palette) for row in index_rows for i in row):
        raise ValueError("pixel index beyond palette")
    gct = bytearray()
    for i in range(table_len):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        gct += bytes((r & 0xFF, g & 0xFF, b & 0xFF))
    packed = 0x80 | n  # GCT present, color resolution bits left 0
    head = (
        b"GIF89a"
        + struct.pack("<HHBBB", width, height, packed, 0, 0)
        + bytes(gct)
    )
    img_desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    mcs = max(2, n + 1)  # LZW min code size (GIF requires >= 2)
    lzw = _lzw_compress([i for row in index_rows for i in row], mcs)
    blocks = bytearray([mcs])
    for off in range(0, len(lzw), 255):
        chunk = lzw[off:off + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return head + img_desc + bytes(blocks) + b"\x3b"


def _gif_walk(data: bytes) -> tuple[int, int, list[tuple[int, int, int]], list[int]]:
    """Parse header + GCT, skip extensions, decode the first image's
    LZW index stream.  Returns (width, height, palette, indices)."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise MediaFormatError("not a GIF payload (bad signature)")
    width, height, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    palette: list[tuple[int, int, int]] = []
    if packed & 0x80:
        n = packed & 0x07
        table_len = 2 << n
        if pos + 3 * table_len > len(data):
            raise MediaFormatError("truncated global color table")
        for i in range(table_len):
            off = pos + 3 * i
            palette.append((data[off], data[off + 1], data[off + 2]))
        pos += 3 * table_len
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            if pos + 11 > len(data):
                raise MediaFormatError("truncated image descriptor")
            _l, _t, iw, ih, ipacked = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            if ipacked & 0x40:
                raise MediaFormatError("interlaced GIF not supported")
            if ipacked & 0x80:
                raise MediaFormatError("local color table not supported")
            if not palette:
                raise MediaFormatError("no color table")
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            indices = _lzw_decompress(bytes(lzw), mcs)
            if len(indices) < iw * ih:
                raise MediaFormatError(
                    f"LZW stream yields {len(indices)} pixels, need {iw * ih}"
                )
            return iw, ih, palette, indices[: iw * ih]
        elif block == 0x3B:  # trailer before any image
            break
        else:
            raise MediaFormatError(f"unknown GIF block 0x{block:02x}")
    raise MediaFormatError("no image data in GIF")


def decode_gif(data: bytes) -> dict:
    """Parse a single-frame GIF; returns width, height, n_pixels,
    n_colors and EXACT per-channel byte sums through the palette —
    the decode_bmp/decode_png oracle surface."""
    width, height, palette, indices = _gif_walk(data)
    if any(i >= len(palette) for i in indices):
        raise MediaFormatError("pixel index beyond color table")
    sum_r = sum(palette[i][0] for i in indices)
    sum_g = sum(palette[i][1] for i in indices)
    sum_b = sum(palette[i][2] for i in indices)
    return {
        "width": width,
        "height": height,
        "n_pixels": width * height,
        "n_colors": len(palette),
        "sum_r": sum_r,
        "sum_g": sum_g,
        "sum_b": sum_b,
    }


def decode_gif_pixels(data: bytes) -> dict:
    """Parse a single-frame GIF into the full RGB pixel grid (palette
    applied), top row first — the perceptual-hash surface."""
    width, height, palette, indices = _gif_walk(data)
    rows = [
        [palette[indices[y * width + x]] for x in range(width)]
        for y in range(height)
    ]
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
