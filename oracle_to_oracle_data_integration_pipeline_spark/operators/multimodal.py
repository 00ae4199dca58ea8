"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

The Spark-side machinery here is real and tested: binary columns,
schema contracts, per-partition batch iteration, deterministic
metadata extraction. Media decoding is REAL for BMP, PCM WAV and PNG —
parsed byte-for-byte by the pure-stdlib codecs in
``operators/media_codecs.py`` (PNG includes the zlib IDAT inflate and
all five scanline filters; exercised end-to-end by the
``media_decode_bmp`` / ``media_decode_wav`` / ``media_decode_png``
qids and their DuckDB oracles). Codec-library formats (JPEG/GIF/TIFF/
WebP) go through an OPTIONAL-DEPENDENCY dispatch: when Pillow is
importable ``decode_media`` decodes them for real; otherwise (this
container) it raises ``NotImplementedError`` unless ``fake=True`` (the
deterministic fake used by the batch-shape qids). Video (MP4) is REAL
at the CONTAINER level — ISO BMFF box walk, mvhd duration, trak
dimensions, handler types (``media_codecs.decode_mp4``, the
``media_decode_mp4`` qid) — while FRAME decode stays a documented stub
pending av/ffmpeg codecs. Either way the Spark plumbing
(batch shape, schema, partitioning) is identical — the dispatch is
entirely inside the per-payload kernel.

Scale notes: media processing is the canonical ``mapInPandas`` case —
embarrassingly parallel, no shuffle, Arrow moves the binary batches to
Python once; batch size governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Partition sizing
should target bytes not rows (a 4K-video column row is ~MBs):
``spark.sql.files.maxPartitionBytes`` down, or repartition by a size
estimate column.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "doc_id long, n_bytes int, width int, height int, fmt string"


def _try_import_pil():
    """Optional-dependency probe for the codec-library formats
    (JPEG/GIF/TIFF/WebP/...). Returns the PIL.Image module when
    Pillow is importable, else None — the dispatch in
    :func:`decode_media` uses it when the stdlib sniffs miss, so the
    same pipeline code runs real decodes wherever the lib exists and
    falls back to the documented stub here (Pillow is absent in this
    container). Import is per-call-site lazy: on an executor the
    Python worker pays it once per process via module import cache."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_media(payload: bytes, fake: bool = False) -> dict:
    """Decode one media payload to metadata.

    REAL path: BMP, RIFF/WAVE and PNG payloads are sniffed by magic
    bytes and parsed by the stdlib codecs (operators/media_codecs.py)
    — no external libraries (PNG needs only stdlib zlib). Codec-library
    raster formats (JPEG/GIF/TIFF/WebP) decode via Pillow WHEN
    IMPORTABLE (optional-dependency dispatch, absent in this
    container); otherwise raises unless ``fake=True`` (the
    deterministic fake derives metadata from byte length so the
    batch-shape qids can verify the full pipeline shape).
    """
    import struct

    from oracle_to_oracle_data_integration_pipeline_spark.operators.media_codecs import (
        _PNG_SIG,
        decode_bmp,
        decode_mp4,
        decode_png,
        decode_wav,
    )

    # magic sniffs validate the header's own size field too — a text
    # payload that merely STARTS with "BM"/"RIFF" must not be
    # misdetected (UTF-8 fixtures flow through this same function)
    if (
        payload[:2] == b"BM"
        and len(payload) >= 54
        and struct.unpack_from("<I", payload, 2)[0] == len(payload)
    ):
        m = decode_bmp(payload)
        return {"n_bytes": m["n_bytes"], "width": m["width"], "height": m["height"], "fmt": "bmp"}
    if (
        payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
        and len(payload) >= 44
        and struct.unpack_from("<I", payload, 4)[0] == len(payload) - 8
    ):
        m = decode_wav(payload)
        # audio has no raster; map duration/channels onto the shared contract
        return {"n_bytes": m["n_bytes"], "width": m["n_frames"], "height": m["n_channels"], "fmt": "wav"}
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        # PNG is a COMPRESSED format but needs only stdlib zlib: full
        # chunk walk + IDAT inflate + 5-filter scanline reconstruction
        m = decode_png(payload)
        return {"n_bytes": m["n_bytes"], "width": m["width"], "height": m["height"], "fmt": "png"}
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        # ISO BMFF (MP4): REAL box-level parse — mvhd duration, trak
        # dimensions, handler types (media_codecs.decode_mp4; box sizes
        # are validated, so a truncated file raises rather than
        # misreads). FRAME decode needs h264/aac codecs and remains the
        # documented stub below.
        m = decode_mp4(payload)
        return {"n_bytes": m["n_bytes"], "width": m["width"], "height": m["height"], "fmt": "mp4"}
    # codec-library formats (JPEG/GIF/TIFF/WebP/...): real decode when
    # Pillow is importable, else the documented stub. The stdlib paths
    # above stay authoritative for BMP/WAV/PNG regardless (they are
    # the oracled ones — engine behavior must not depend on whether an
    # optional lib happens to be installed for those formats).
    # fake=True means the caller wants the DETERMINISTIC stub: skip
    # the optional-lib dispatch entirely, or the same call would
    # return different values depending on whether Pillow is
    # installed — exactly the environment-dependence the oracled
    # batch-shape qids must not have.
    pil_image = None if fake else _try_import_pil()
    if pil_image is not None:
        import io

        try:
            with pil_image.open(io.BytesIO(payload)) as img:
                w, h = img.size
                return {
                    "n_bytes": len(payload),
                    "width": int(w),
                    "height": int(h),
                    "fmt": (img.format or "unknown").lower(),
                }
        except Exception:
            pass  # not an image Pillow knows; fall through to stub/raise
    if not fake:
        raise NotImplementedError(
            "compressed media formats require imaging/audio libraries not present "
            "in this environment; BMP/WAV/PNG decode natively, install Pillow for "
            "JPEG/GIF/TIFF/WebP, or pass fake=True for the deterministic stub"
        )
    n = len(payload)
    return {"n_bytes": n, "width": n % 64 + 1, "height": n % 37 + 1, "fmt": "fake"}


def attach_binary_payload(df: DataFrame, text: str = "text") -> DataFrame:
    """Derive an opaque binary column (fixtures carry no real media;
    UTF-8 bytes of the text stand in — the pipeline treats it as an
    opaque blob either way)."""
    return df.select("doc_id", F.encode(F.col(text), "UTF-8").alias("payload"))


def extract_media_metadata(df_with_payload: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column."""
    import pandas as pd

    _missing = {"n_bytes": None, "width": None, "height": None, "fmt": None}

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            # a NULL payload (missing blob) is normal pipeline input at
            # scale: propagate NULL metadata instead of crashing the
            # executor (fuzz find, tools/fuzz_parity.py nulls profile)
            metas = [
                decode_media(p, fake=fake) if p is not None else dict(_missing)
                for p in pdf["payload"]
            ]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[["doc_id", "n_bytes", "width", "height", "fmt"]]

    return df_with_payload.mapInPandas(batches, schema=META_SCHEMA)


RESIZE_SCHEMA = "doc_id long, width int, height int, n_bytes_out int"


def _resize_payload_real(payload: bytes, target_w: int, target_h: int) -> int:
    """Real per-payload resize body (module-level so it is unit-testable
    outside a Spark executor): Pillow when importable, else the
    documented raise. Returns the target raster's raw pixel byte count
    (w·h·bands)."""
    pil_image = _try_import_pil()
    if pil_image is None:
        decode_media(b"", fake=False)  # raises: real path not available
    import io

    with pil_image.open(io.BytesIO(payload)) as img:
        resized = img.resize((target_w, target_h))
        return target_w * target_h * len(resized.getbands())


def resize_media(
    df_with_payload: DataFrame,
    target_w: int = 32,
    target_h: int = 32,
    fake: bool = True,
) -> DataFrame:
    """Resize every payload to ``target_w x target_h`` — 1:1 row batch
    shape. The REAL stdlib nearest-neighbor kernel lives in
    media_codecs (BMP; qid ``media_resize_real``); here the non-fake
    path dispatches codec-library formats to Pillow when importable
    (``img.resize``; n_bytes_out = the target raster's raw pixel
    bytes), and otherwise raises. The fake models the real invariant
    (output byte count capped by the target raster, ``min(len, w*h)``)
    without a pixel library."""
    import pandas as pd

    def real_resize(payload: bytes) -> int:
        return _resize_payload_real(payload, target_w, target_h)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            # NULL payload → NULL output raster (missing blob, not a crash)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": [None if p is None else target_w for p in pdf["payload"]],
                    "height": [None if p is None else target_h for p in pdf["payload"]],
                    "n_bytes_out": [
                        None
                        if p is None
                        else (
                            min(len(p), target_w * target_h)
                            if fake
                            else real_resize(p)
                        )
                        for p in pdf["payload"]
                    ],
                }
            )
            yield out

    return df_with_payload.mapInPandas(batches, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes int"


def sample_frames(
    df_with_payload: DataFrame,
    frame_size: int = 64,
    stride: int = 2,
    max_frames: int = 4,
    fake: bool = True,
) -> DataFrame:
    """Frame sampling — the 1:N batch shape (one input row fans out to
    up to ``max_frames`` frame rows inside the Arrow batch, no explode
    or shuffle). STUB: fake frames are fixed-size byte windows; the
    real path is keyframe extraction (av/ffmpeg) with the same output
    contract."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            if not fake:
                decode_media(b"", fake=False)
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                if p is None:  # missing blob → no frames (1:N shape)
                    continue
                n = len(p)
                n_frames = (n + frame_size - 1) // frame_size
                for k, i in enumerate(range(0, n_frames, stride)):
                    if k >= max_frames:
                        break
                    rows.append((doc_id, i, min(frame_size, n - i * frame_size)))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    return df_with_payload.mapInPandas(batches, schema=FRAME_SCHEMA)


def extract_features(
    df_with_payload: DataFrame,
    dim: int = 8,
    fake: bool = True,
) -> DataFrame:
    """Per-payload feature vector (``array<double>``) — the
    media-to-embedding step that feeds the similarity/ANN operators.
    STUB: the fake derives features from the byte length so the full
    media→embedding→ANN composition is testable end-to-end. The real
    path is model inference: load the model once per PYTHON WORKER
    (module-level lazy init, not per batch), never broadcast weights
    through the closure."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            if not fake:
                decode_media(b"", fake=False)
            feats = [
                None
                if p is None  # missing blob → NULL feature vector
                else [float((len(p) * (i + 1)) % 97) / 97.0 for i in range(dim)]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "features": feats})

    return df_with_payload.mapInPandas(batches, schema="doc_id long, features array<double>")
