"""Pure-stdlib media codecs for uncompressed container formats —
the REAL decode kernel behind operators/multimodal.py for formats that
need no imaging/audio libraries:

- **BMP** (Windows DIB, BITMAPINFOHEADER, 24bpp uncompressed): full
  header parse + pixel-raster round-trip via ``struct``.
- **WAV** (RIFF PCM): fmt-chunk parse — channels, sample rate, bit
  depth, frame count, duration.

Compressed formats (JPEG/PNG/MP4/...) still require PIL/av and remain
stubbed in ``multimodal.decode_media`` — but the dispatch, the Spark
plumbing, and these two decoders are the real path, so the engine's
media surface is "real kernel for uncompressed formats, documented
stub for codec-library formats".

Everything is deterministic byte arithmetic, which is what lets the
media qids carry exact DuckDB oracles: the oracle recomputes the
header fields the encoder wrote from the same inputs, and the qid only
passes if the decoder actually parsed them back out of the bytes.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------- BMP

_BMP_FILE_HDR = 14
_BMP_INFO_HDR = 40


def bmp_row_size(width: int, bpp: int = 24) -> int:
    """Rows are padded to 4-byte boundaries — the detail every naive
    BMP reader gets wrong."""
    return ((width * bpp // 8) + 3) // 4 * 4


def encode_bmp(width: int, height: int, pixel_bytes: bytes) -> bytes:
    """Valid 24bpp bottom-up BMP. ``pixel_bytes`` fills the raster
    row-major (BGR), truncated / zero-padded to width*height*3."""
    row = bmp_row_size(width)
    raster = bytearray()
    need = width * 3
    src = pixel_bytes.ljust(width * height * 3, b"\x00")
    for y in range(height):
        raster += src[y * need : (y + 1) * need].ljust(row, b"\x00")
    size = _BMP_FILE_HDR + _BMP_INFO_HDR + len(raster)
    hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, _BMP_FILE_HDR + _BMP_INFO_HDR)
    info = struct.pack(
        "<IiiHHIIiiII", _BMP_INFO_HDR, width, height, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return hdr + info + bytes(raster)


def decode_bmp(payload: bytes) -> dict:
    """Parse a BITMAPINFOHEADER BMP: dimensions, bpp, raster size.
    Raises ValueError on anything that is not an uncompressed 24bpp
    DIB (the honest contract — no silent garbage)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_size < _BMP_INFO_HDR or compression != 0:
        raise ValueError("only uncompressed BITMAPINFOHEADER BMPs supported")
    if bpp != 24:
        raise ValueError(f"only 24bpp BMPs supported, got {bpp}")
    height_abs = abs(height)
    raster = len(payload) - data_off
    return {
        "fmt": "bmp",
        "width": width,
        "height": height_abs,
        "bpp": bpp,
        "n_bytes": len(payload),
        "raster_bytes": raster,
    }


def bmp_pixels(payload: bytes) -> bytes:
    """Un-padded row-major pixel bytes (the decode that feeds feature
    extraction) — inverse of ``encode_bmp`` up to the zero padding."""
    meta = decode_bmp(payload)
    data_off = struct.unpack_from("<I", payload, 10)[0]
    row = bmp_row_size(meta["width"], meta["bpp"])
    need = meta["width"] * meta["bpp"] // 8
    out = bytearray()
    for y in range(meta["height"]):
        start = data_off + y * row
        out += payload[start : start + need]
    return bytes(out)


# ---------------------------------------------------------------- WAV

def encode_wav(
    pcm: bytes, sample_rate: int = 8000, n_channels: int = 1, bits: int = 16
) -> bytes:
    """Valid RIFF/WAVE with a single PCM data chunk."""
    block_align = n_channels * bits // 8
    byte_rate = sample_rate * block_align
    pcm = pcm[: len(pcm) - len(pcm) % block_align]  # whole frames only
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, n_channels, sample_rate, byte_rate, block_align, bits)
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
    return riff + fmt + data


def decode_wav(payload: bytes) -> dict:
    """Parse RIFF/WAVE PCM: walks chunks (a real reader cannot assume
    fmt/data adjacency — the data size is recorded while walking and
    frame accounting happens after, so either chunk order works),
    returns rate/channels/bits/frames/duration. Raises ValueError for
    anything that is not a complete PCM WAV (missing fmt/data chunk,
    zero sample rate / block align, compressed audio formats)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, n = 12, len(payload)
    meta: dict = {"fmt": "wav"}
    data_size = None
    while pos + 8 <= n:
        cid, csize = struct.unpack_from("<4sI", payload, pos)
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, ch, sr, _br, ba, bits = struct.unpack_from("<HHIIHH", payload, body)
            if audio_fmt != 1:
                raise ValueError("only PCM WAV supported (compressed needs audio libs)")
            meta.update(n_channels=ch, sample_rate=sr, bits=bits, block_align=ba)
        elif cid == b"data":
            data_size = csize
        pos = body + csize + (csize & 1)  # chunks are word-aligned
    if "block_align" not in meta or data_size is None:
        raise ValueError("WAV missing fmt or data chunk")
    if meta["block_align"] == 0 or meta["sample_rate"] == 0:
        raise ValueError("WAV fmt chunk has zero block_align or sample_rate")
    meta["n_frames"] = data_size // meta["block_align"]
    meta["duration_ms"] = meta["n_frames"] * 1000 // meta["sample_rate"]
    meta["n_bytes"] = len(payload)
    return meta


# ---------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixel_bytes: bytes) -> bytes:
    """Valid non-interlaced 8-bit truecolor (RGB) PNG. ``pixel_bytes``
    fills the raster row-major, truncated / zero-padded to w*h*3.

    Each row y uses filter type ``y % 5`` — None/Sub/Up/Average/Paeth —
    so a decoder must implement ALL five reconstruction filters to
    round-trip the raster (a filter-0-only writer would let a broken
    unfilter pass silently)."""
    import zlib

    bpl = width * 3  # bytes per scanline, bpp = 3 (8-bit RGB)
    src = pixel_bytes.ljust(width * height * 3, b"\x00")[: width * height * 3]
    prev = bytes(bpl)
    out = bytearray()
    for y in range(height):
        raw = src[y * bpl : (y + 1) * bpl]
        ft = y % 5
        out.append(ft)
        for i in range(bpl):
            a = raw[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            x = raw[i]
            if ft == 0:
                f = x
            elif ft == 1:
                f = x - a
            elif ft == 2:
                f = x - b
            elif ft == 3:
                f = x - (a + b) // 2
            else:
                f = x - _paeth(a, b, c)
            out.append(f & 0xFF)
        prev = raw
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict:
    """Parse a PNG: signature + chunk walk + IHDR fields + full IDAT
    inflate and scanline unfiltering (all five filter types). Raises
    ValueError for anything that is not a non-interlaced 8-bit
    truecolor PNG — the honest contract, no silent garbage.

    Returns metadata including the unfiltered raster under "pixels"
    (consumed by ``png_pixels``); "raster_bytes" is its length.
    """
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, n = len(_PNG_SIG), len(payload)
    width = height = None
    idat = bytearray()
    while pos + 8 <= n:
        (clen,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "only non-interlaced 8-bit truecolor PNGs supported, got "
                    f"depth={depth} color={color} interlace={interlace}"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + clen  # len + tag + data + crc
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT chunk")
    raw = zlib.decompress(bytes(idat))
    bpl = width * 3
    if len(raw) != height * (bpl + 1):
        raise ValueError("PNG IDAT length does not match dimensions")
    prev = bytearray(bpl)
    pixels = bytearray()
    for y in range(height):
        ft = raw[y * (bpl + 1)]
        line = bytearray(raw[y * (bpl + 1) + 1 : (y + 1) * (bpl + 1)])
        for i in range(bpl):
            a = line[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if ft == 0:
                r = line[i]
            elif ft == 1:
                r = line[i] + a
            elif ft == 2:
                r = line[i] + b
            elif ft == 3:
                r = line[i] + (a + b) // 2
            elif ft == 4:
                r = line[i] + _paeth(a, b, c)
            else:
                raise ValueError(f"unknown PNG filter type {ft}")
            line[i] = r & 0xFF
        pixels += line
        prev = line
    return {
        "fmt": "png",
        "width": width,
        "height": height,
        "bit_depth": 8,
        "n_bytes": len(payload),
        "raster_bytes": len(pixels),
        "pixels": bytes(pixels),
    }


def png_pixels(payload: bytes) -> bytes:
    """Unfiltered row-major RGB bytes — inverse of ``encode_png`` up to
    the zero padding."""
    return decode_png(payload)["pixels"]


def resize_nearest(pixels: bytes, w: int, h: int, tw: int, th: int) -> bytes:
    """Nearest-neighbor raster resample (RGB, row-major): target pixel
    (x,y) takes source pixel (x·w//tw, y·h//th). The real kernel behind
    the PNG resize qid — deterministic integer index arithmetic, so a
    SQL oracle can recompute every sampled byte."""
    out = bytearray()
    for y in range(th):
        sy = y * h // th
        for x in range(tw):
            sx = x * w // tw
            i = (sy * w + sx) * 3
            out += pixels[i : i + 3]
    return bytes(out)
