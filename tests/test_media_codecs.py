"""Unit tests for the pure-stdlib media codecs and the decode_media
dispatch: byte-exact round trips, 4-byte row padding, chunk walking,
and the magic-sniff guards that keep UTF-8 text payloads from being
misdetected as media."""

from __future__ import annotations

import pytest

from oracle_to_oracle_data_integration_pipeline_spark.operators.media_codecs import (
    bmp_pixels,
    bmp_row_size,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)
from oracle_to_oracle_data_integration_pipeline_spark.operators.multimodal import decode_media


def test_bmp_round_trip_with_row_padding():
    # width 3 -> row 9 bytes padded to 12: the padding case
    pix = bytes(range(3 * 3 * 3))
    payload = encode_bmp(3, 3, pix)
    meta = decode_bmp(payload)
    assert (meta["width"], meta["height"], meta["bpp"]) == (3, 3, 24)
    assert meta["n_bytes"] == 54 + bmp_row_size(3) * 3 == 54 + 36
    assert bmp_pixels(payload) == pix


def test_bmp_pixels_truncation_and_zero_pad():
    payload = encode_bmp(2, 2, b"\x01\x02")
    assert bmp_pixels(payload) == b"\x01\x02" + b"\x00" * 10


def test_wav_round_trip_and_frame_accounting():
    pcm = bytes(range(100)) * 2  # 200 bytes -> 100 frames at 16-bit mono
    m = decode_wav(encode_wav(pcm, sample_rate=8000))
    assert m["n_frames"] == 100
    assert m["sample_rate"] == 8000
    assert m["duration_ms"] == 100 * 1000 // 8000
    assert m["n_bytes"] == 44 + 200


def test_wav_odd_pcm_truncated_to_whole_frames():
    m = decode_wav(encode_wav(b"\x01\x02\x03", sample_rate=8000))
    assert m["n_frames"] == 1


def test_decode_media_dispatches_real_formats():
    assert decode_media(encode_bmp(4, 2, b"xy"))["fmt"] == "bmp"
    assert decode_media(encode_wav(b"abcd"))["fmt"] == "wav"


def test_decode_media_text_starting_with_magic_is_not_misdetected():
    # "BM..." / "RIFF..." as plain text: header size fields won't match,
    # so the sniff must fall through to the stub behavior
    for text in (b"BM" + b"x" * 100, b"RIFF" + b"x" * 100):
        with pytest.raises(NotImplementedError):
            decode_media(text)
        assert decode_media(text, fake=True)["fmt"] == "fake"


def test_decode_rejects_malformed():
    with pytest.raises(ValueError):
        decode_bmp(b"nope")
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")


def test_wav_incomplete_chunks_raise_value_error():
    import struct

    # RIFF/WAVE with a data chunk but no fmt chunk (and vice versa):
    # the walker must fail with the documented ValueError, not KeyError
    data_only = struct.pack("<4sI4s", b"RIFF", 4 + 8 + 4, b"WAVE") + struct.pack(
        "<4sI", b"data", 4
    ) + b"abcd"
    with pytest.raises(ValueError, match="missing fmt or data"):
        decode_wav(data_only)
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16)
    fmt_only = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt), b"WAVE") + fmt
    with pytest.raises(ValueError, match="missing fmt or data"):
        decode_wav(fmt_only)


def test_wav_data_before_fmt_decodes():
    import struct

    # chunk order must not matter (the walker records sizes, then
    # computes frames after the walk)
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16)
    data = struct.pack("<4sI", b"data", 4) + b"abcd"
    payload = struct.pack("<4sI4s", b"RIFF", 4 + len(data) + len(fmt), b"WAVE") + data + fmt
    assert decode_wav(payload)["n_frames"] == 2


def test_bmp_non_24bpp_rejected():
    import struct

    payload = bytearray(encode_bmp(2, 2, b"xy"))
    struct.pack_into("<H", payload, 28, 32)  # flip bpp field to 32
    with pytest.raises(ValueError, match="24bpp"):
        decode_bmp(bytes(payload))


# ---- property tests: any dims/payload must round-trip byte-exactly --

from hypothesis import given, settings
from hypothesis import strategies as st


@given(w=st.integers(1, 40), h=st.integers(1, 20), data=st.binary(max_size=400))
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip_property(w, h, data):
    payload = encode_bmp(w, h, data)
    m = decode_bmp(payload)
    assert (m["width"], m["height"], m["bpp"]) == (w, h, 24)
    assert bmp_pixels(payload) == data[: w * h * 3].ljust(w * h * 3, b"\x00")


@given(
    pcm=st.binary(max_size=600),
    sr=st.sampled_from([8000, 16000, 44100]),
    ch=st.sampled_from([1, 2]),
    bits=st.sampled_from([8, 16]),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(pcm, sr, ch, bits):
    m = decode_wav(encode_wav(pcm, sample_rate=sr, n_channels=ch, bits=bits))
    block = ch * bits // 8
    assert m["n_frames"] == len(pcm) // block
    assert (m["sample_rate"], m["n_channels"], m["bits"]) == (sr, ch, bits)
    assert m["duration_ms"] == (len(pcm) // block) * 1000 // sr


from oracle_to_oracle_data_integration_pipeline_spark.operators.media_codecs import (  # noqa: E402
    decode_png,
    encode_png,
    png_pixels,
)


@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=20),
    data=st.binary(max_size=800),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(w, h, data):
    """Encode cycles all five PNG filter types across rows (y % 5), so
    this round-trip property exercises None/Sub/Up/Average/Paeth
    reconstruction — incl. zlib inflate and chunk CRC layout."""
    payload = encode_png(w, h, data)
    m = decode_png(payload)
    assert (m["width"], m["height"], m["bit_depth"]) == (w, h, 8)
    assert m["raster_bytes"] == w * h * 3
    assert png_pixels(payload) == data[: w * h * 3].ljust(w * h * 3, b"\x00")


def test_png_rejects_non_png_and_truncated():
    import pytest

    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    good = encode_png(3, 3, bytes(range(27)))
    with pytest.raises(ValueError):
        decode_png(good[:20])  # signature ok, chunks missing


def test_png_dispatch_through_decode_media():
    from oracle_to_oracle_data_integration_pipeline_spark.operators.multimodal import decode_media

    payload = encode_png(5, 4, b"\x01\x02" * 40)
    m = decode_media(payload)
    assert m == {"n_bytes": len(payload), "width": 5, "height": 4, "fmt": "png"}


def test_resize_nearest_identity_and_downsample():
    from oracle_to_oracle_data_integration_pipeline_spark.operators.media_codecs import resize_nearest

    w, h = 10, 6
    px = bytes(range(256)).ljust(w * h * 3, b"\x00")[: w * h * 3]
    assert resize_nearest(px, w, h, w, h) == px
    small = resize_nearest(px, w, h, 2, 2)
    assert len(small) == 2 * 2 * 3
    # corner pixel (0,0) is preserved by nearest-neighbor
    assert small[:3] == px[:3]


# -- optional-dependency dispatch (JPEG et al. via Pillow when present) --

JPEG_MAGIC_PAYLOAD = b"\xff\xd8\xff\xe0" + b"\x00" * 60  # passes no stdlib sniff


class _FakePilImage:
    """Stands in for a PIL.Image.Image: context manager + size/format."""

    size = (640, 480)
    format = "JPEG"

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def test_decode_media_uses_pillow_when_importable(monkeypatch):
    """With Pillow importable, a JPEG payload decodes for real through
    the optional-dependency dispatch — no stub, no raise."""
    import sys
    import types

    image_mod = types.SimpleNamespace(open=lambda buf: _FakePilImage())
    pil_pkg = types.ModuleType("PIL")
    pil_pkg.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil_pkg)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)

    meta = decode_media(JPEG_MAGIC_PAYLOAD, fake=False)
    assert meta == {
        "n_bytes": len(JPEG_MAGIC_PAYLOAD),
        "width": 640,
        "height": 480,
        "fmt": "jpeg",
    }


def test_decode_media_fake_is_deterministic_even_with_pillow(monkeypatch):
    """fake=True promises the DETERMINISTIC stub — the optional-lib
    dispatch must be skipped entirely, or the same call would return
    different values depending on whether Pillow happens to be
    installed (the batch-shape qids' oracles model the stub)."""
    import sys
    import types

    image_mod = types.SimpleNamespace(open=lambda buf: _FakePilImage())
    pil_pkg = types.ModuleType("PIL")
    pil_pkg.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil_pkg)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)

    meta = decode_media(JPEG_MAGIC_PAYLOAD, fake=True)
    n = len(JPEG_MAGIC_PAYLOAD)
    assert meta == {
        "n_bytes": n,
        "width": n % 64 + 1,
        "height": n % 37 + 1,
        "fmt": "fake",
    }


def test_decode_media_pillow_unreadable_payload_falls_back(monkeypatch):
    """A payload Pillow rejects flows on to the stub/raise path — the
    dispatch never masks the documented contract."""
    import sys
    import types

    def _raise(_buf):
        raise OSError("cannot identify image file")

    image_mod = types.SimpleNamespace(open=_raise)
    pil_pkg = types.ModuleType("PIL")
    pil_pkg.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil_pkg)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)

    with pytest.raises(NotImplementedError):
        decode_media(JPEG_MAGIC_PAYLOAD, fake=False)
    assert decode_media(JPEG_MAGIC_PAYLOAD, fake=True)["fmt"] == "fake"


def test_decode_media_without_pillow_keeps_stub_contract():
    """In this container Pillow is absent: codec-library formats raise
    without fake=True and stub deterministically with it — unchanged
    behavior, now guarded."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.multimodal import _try_import_pil

    if _try_import_pil() is not None:
        pytest.skip("Pillow installed; the no-lib path is not reachable here")
    with pytest.raises(NotImplementedError):
        decode_media(JPEG_MAGIC_PAYLOAD, fake=False)
    assert decode_media(JPEG_MAGIC_PAYLOAD, fake=True)["fmt"] == "fake"


def test_resize_kernel_dispatches_to_pillow(monkeypatch):
    """The real resize body must go through Pillow when importable:
    n_bytes_out = target raster raw pixel bytes (w·h·bands). Tested
    driver-side on the module-level kernel (an executor's Python
    worker would not see the monkeypatched module)."""
    import sys
    import types

    class _Resized:
        @staticmethod
        def getbands():
            return ("R", "G", "B")

    class _Img(_FakePilImage):
        @staticmethod
        def resize(size):
            assert size == (8, 8)
            return _Resized()

    image_mod = types.SimpleNamespace(open=lambda buf: _Img())
    pil_pkg = types.ModuleType("PIL")
    pil_pkg.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil_pkg)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)

    from oracle_to_oracle_data_integration_pipeline_spark.operators.multimodal import (
        _resize_payload_real,
    )

    assert _resize_payload_real(b"\xff\xd8" + b"x" * 100, 8, 8) == 192


def test_resize_kernel_without_pillow_raises():
    from oracle_to_oracle_data_integration_pipeline_spark.operators.multimodal import (
        _resize_payload_real,
        _try_import_pil,
    )

    if _try_import_pil() is not None:
        pytest.skip("Pillow installed; the no-lib path is not reachable here")
    with pytest.raises(NotImplementedError):
        _resize_payload_real(b"\xff\xd8" + b"x" * 100, 8, 8)


def test_resize_media_fake_path_via_spark(spark):
    from oracle_to_oracle_data_integration_pipeline_spark.operators.multimodal import (
        resize_media,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"\xff\xd8" + b"x" * 100))], "doc_id long, payload binary"
    )
    rows = resize_media(df, target_w=8, target_h=8, fake=True).collect()
    assert rows[0]["n_bytes_out"] == 64  # fake invariant: min(len, w*h)


def test_decode_media_real_pillow_jpeg_and_gif():
    """REAL-Pillow arm of the dispatch matrix (runs only where Pillow
    is installed — this container skips): a JPEG and a GIF rendered by
    Pillow itself must decode to their true dimensions through
    decode_media's optional-lib path, exercising the actual library
    rather than the monkeypatched stand-in above. Together with
    test_decode_media_without_pillow_keeps_stub_contract, exactly one
    of the two arms runs in any environment and both are covered by
    the matrix."""
    pil = pytest.importorskip("PIL.Image")
    import io

    for fmt, size in (("JPEG", (31, 17)), ("GIF", (9, 13))):
        buf = io.BytesIO()
        pil.new("RGB", size, color=(200, 10, 10)).save(buf, format=fmt)
        meta = decode_media(buf.getvalue(), fake=False)
        assert (meta["width"], meta["height"]) == size
        assert meta["fmt"] == fmt.lower()
        assert meta["n_bytes"] == len(buf.getvalue())


# ------------------------------------------------------------- MP4


def test_mp4_roundtrip_video_only():
    from oracle_to_oracle_data_integration_pipeline_spark.operators.media_codecs import (
        decode_mp4,
        encode_mp4,
    )

    b = encode_mp4(90_000, 1920, 1080, audio=False, mdat=b"\x00" * 100)
    m = decode_mp4(b)
    assert m["duration_ms"] == 90_000 and m["timescale"] == 1000
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["n_tracks"] == 1 and m["handlers"] == "vide"
    assert m["n_bytes"] == len(b)


def test_mp4_roundtrip_with_audio_track():
    from oracle_to_oracle_data_integration_pipeline_spark.operators.media_codecs import (
        decode_mp4,
        encode_mp4,
    )

    m = decode_mp4(encode_mp4(5, 31, 17, audio=True))
    assert m["n_tracks"] == 2 and m["handlers"] == "vide,soun"
    # dimensions come from the FIRST video track, not the 0x0 audio one
    assert (m["width"], m["height"]) == (31, 17)


def test_mp4_truncation_raises_not_misreads():
    import pytest

    from oracle_to_oracle_data_integration_pipeline_spark.operators.media_codecs import (
        decode_mp4,
        encode_mp4,
    )

    b = encode_mp4(10, 4, 4)
    with pytest.raises(ValueError):
        decode_mp4(b[: len(b) // 2])  # box size exceeds remaining bytes
    with pytest.raises(ValueError):
        decode_mp4(b"\x00\x00\x00\x08mdat")  # no moov at all


def test_mp4_largesize_and_v1_mvhd():
    """decode must handle the 64-bit forms real muxers emit for >4 GiB
    files: size==1 + largesize box headers, and version-1 mvhd with
    64-bit creation/modification/duration fields."""
    import struct

    from oracle_to_oracle_data_integration_pipeline_spark.operators.media_codecs import (
        decode_mp4,
    )

    mvhd_v1_body = (
        struct.pack(">B", 1) + b"\x00\x00\x00"  # version 1, flags
        + struct.pack(">QQIQ", 0, 0, 90_000, 270_000)  # 64-bit times, ts, dur
        + b"\x00" * 80
    )
    mvhd = struct.pack(">I", 8 + len(mvhd_v1_body)) + b"mvhd" + mvhd_v1_body
    # moov wrapped with size==1 + 64-bit largesize
    moov = struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(mvhd)) + mvhd
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4
    m = decode_mp4(ftyp + moov)
    assert m["timescale"] == 90_000
    assert m["duration_ms"] == 270_000 * 1000 // 90_000
    assert m["n_tracks"] == 0 and m["width"] == 0


def test_decode_media_dispatches_mp4():
    from oracle_to_oracle_data_integration_pipeline_spark.operators.media_codecs import (
        encode_mp4,
    )
    from oracle_to_oracle_data_integration_pipeline_spark.operators.multimodal import (
        decode_media,
    )

    m = decode_media(encode_mp4(1000, 64, 36, mdat=b"x"))
    assert m["fmt"] == "mp4" and (m["width"], m["height"]) == (64, 36)
