"""Pure-stdlib media codecs for uncompressed container formats —
the REAL decode kernel behind operators/multimodal.py for formats that
need no imaging/audio libraries:

- **BMP** (Windows DIB, BITMAPINFOHEADER, 24bpp uncompressed): full
  header parse + pixel-raster round-trip via ``struct``.
- **WAV** (RIFF PCM): fmt-chunk parse — channels, sample rate, bit
  depth, frame count, duration.
- **PNG** (non-interlaced 8-bit RGB): chunk walk, IDAT zlib inflate,
  all five scanline filters — stdlib zlib only.
- **MP4** (ISO BMFF): box-level parse — mvhd timescale/duration, trak
  dimensions, handler types, 64-bit largesize; validated sizes.

Codec-library formats (JPEG/GIF/TIFF/WebP raster decode; h264/aac
FRAME decode inside MP4) still require PIL/av and remain stubbed in
``multimodal.decode_media`` — but the dispatch, the Spark plumbing,
and these decoders are the real path, so the engine's media surface is
"real kernel for container/uncompressed formats, documented stub for
codec-payload decode".

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


# ---------------------------------------------------------------- MP4
# ISO BMFF (MP4) at the BOX level — pure stdlib. Frame decode requires
# codec libraries (h264/aac) and stays behind the documented stub; the
# container structure itself — the part every media pipeline reads
# first for routing, dedup-by-duration, and corpus stats — is plain
# length-prefixed box arithmetic, exactly like BMP/WAV headers.

_MP4_TIMESCALE = 1000  # 1 tick = 1 ms; duration fields are then ms


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def _full_box(tag: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(tag, struct.pack(">B", version) + flags.to_bytes(3, "big") + body)


def _tkhd(track_id: int, duration: int, width: int, height: int) -> bytes:
    body = struct.pack(
        ">IIII", 0, 0, track_id, 0
    ) + struct.pack(">I", duration) + b"\x00" * 8 + struct.pack(
        ">hhhh", 0, 0, 0x0100 if width == 0 else 0, 0
    ) + _IDENTITY_MATRIX + struct.pack(">II", width << 16, height << 16)
    return _full_box(b"tkhd", 0, 7, body)


_IDENTITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def _trak(track_id: int, duration: int, width: int, height: int, handler: bytes) -> bytes:
    mdhd = _full_box(
        b"mdhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, _MP4_TIMESCALE, duration) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full_box(
        b"hdlr", 0, 0, struct.pack(">I", 0) + handler + b"\x00" * 12 + b"Handler\x00"
    )
    mdia = _box(b"mdia", mdhd + hdlr)
    return _box(b"trak", _tkhd(track_id, duration, width, height) + mdia)


def encode_mp4(
    duration_ms: int,
    width: int,
    height: int,
    audio: bool = False,
    mdat: bytes = b"",
) -> bytes:
    """Minimal structurally-valid ISO BMFF file: ftyp + moov (mvhd +
    one video trak, optionally one audio trak) + mdat carrying
    ``mdat``. Timescale is fixed at 1000 so durations are milliseconds.
    Every box length is a fixed function of the track count — the
    total size is ``base(audio) + len(mdat)``, which is what lets the
    decode qid's oracle recompute n_bytes in SQL."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mvhd = _full_box(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, _MP4_TIMESCALE, duration_ms)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume 1.0
        + b"\x00" * 10
        + _IDENTITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 3 if audio else 2),  # next_track_id
    )
    traks = _trak(1, duration_ms, width, height, b"vide")
    if audio:
        traks += _trak(2, duration_ms, 0, 0, b"soun")
    moov = _box(b"moov", mvhd + traks)
    return ftyp + moov + _box(b"mdat", mdat)


def _walk_boxes(buf: bytes, start: int, end: int):
    """Yield (tag, body_start, body_end) for each box in buf[start:end],
    validating size fields (8-byte minimum, 64-bit largesize via
    size==1, size==0 = to-end) — a wrong size is a parse error, not a
    silent misread."""
    off = start
    while off < end:
        if off + 8 > end:
            raise ValueError("mp4: truncated box header")
        size = struct.unpack_from(">I", buf, off)[0]
        tag = buf[off + 4 : off + 8]
        body = off + 8
        if size == 1:
            if off + 16 > end:
                raise ValueError("mp4: truncated largesize")
            size = struct.unpack_from(">Q", buf, off + 8)[0]
            body = off + 16
        elif size == 0:
            size = end - off
        if size < body - off or off + size > end:
            raise ValueError(f"mp4: bad box size {size} for {tag!r}")
        yield tag, body, off + size
        off += size


def decode_mp4(payload: bytes) -> dict:
    """Parse the box structure of an ISO BMFF payload: mvhd timescale
    and duration, per-trak tkhd dimensions and hdlr handler types.
    Handles version-0 (32-bit) and version-1 (64-bit) mvhd/tkhd times
    and 64-bit largesize boxes. Returns n_bytes, timescale,
    duration_ms, n_tracks, width/height of the FIRST video track (0 if
    none), and the comma-joined handler list in file order."""
    timescale = duration = None
    n_tracks = 0
    width = height = 0
    handlers: list[str] = []
    for tag, b0, b1 in _walk_boxes(payload, 0, len(payload)):
        if tag != b"moov":
            continue
        for t2, c0, c1 in _walk_boxes(payload, b0, b1):
            if t2 == b"mvhd":
                ver = payload[c0]
                if ver == 1:
                    timescale = struct.unpack_from(">I", payload, c0 + 20)[0]
                    duration = struct.unpack_from(">Q", payload, c0 + 24)[0]
                else:
                    timescale = struct.unpack_from(">I", payload, c0 + 12)[0]
                    duration = struct.unpack_from(">I", payload, c0 + 16)[0]
            elif t2 == b"trak":
                n_tracks += 1
                t_w = t_h = 0
                t_handler = ""
                for t3, d0, d1 in _walk_boxes(payload, c0, c1):
                    if t3 == b"tkhd":
                        # width/height are the LAST 8 bytes (16.16
                        # fixed point) in both tkhd versions
                        t_w = struct.unpack_from(">I", payload, d1 - 8)[0] >> 16
                        t_h = struct.unpack_from(">I", payload, d1 - 4)[0] >> 16
                    elif t3 == b"mdia":
                        for t4, e0, e1 in _walk_boxes(payload, d0, d1):
                            if t4 == b"hdlr":
                                t_handler = payload[e0 + 8 : e0 + 12].decode(
                                    "ascii", "replace"
                                )
                handlers.append(t_handler)
                if t_handler == "vide" and width == 0:
                    width, height = t_w, t_h
    if timescale is None:
        raise ValueError("mp4: no moov/mvhd box")
    return {
        "n_bytes": len(payload),
        "timescale": timescale,
        "duration_ms": (
            duration if timescale == _MP4_TIMESCALE
            else int(duration * 1000 // max(timescale, 1))
        ),
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
        "handlers": ",".join(handlers),
    }
