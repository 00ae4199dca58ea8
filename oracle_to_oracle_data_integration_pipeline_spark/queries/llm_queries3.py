"""Third LLM-data batch: multimodal processing verbs beyond metadata
extraction — resize, frame sampling, feature extraction, real decode —
each the Arrow ``mapInPandas`` plumbing a media pipeline needs.

The decode kernel is REAL for BMP / PCM WAV / PNG (pure-stdlib codecs
in operators/media_codecs.py, exercised by the ``media_decode_*``
qids), and every processing verb has a real-kernel variant:
``media_resize_real`` (PNG decode→nearest-neighbor→re-encode),
``media_frames_real`` (WAV PCM window slicing with exact sample sums),
``media_features_real`` (PNG raster channel means). The generic
resize/frame/feature verbs keep the deterministic fake kernel so the
batch shapes stay verified for codec-library formats (absent in this
container), each with a DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
    resize_media,
    sample_frames,
)
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load, pround


# -- qid: media_resize ------------------------------------------------

def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-to-32x32 over the opaque payload column (1:1 Arrow batch
    shape; fake kernel models the output-bytes-capped-by-raster
    invariant)."""
    d = attach_binary_payload(load(spark, sf_dir, "documents"))
    return resize_media(d, target_w=32, target_h=32)


SQL_MEDIA_RESIZE = """
-- NULL text → NULL payload → NULL output raster (the operator carries
-- missing blobs through instead of crashing; fuzz find, nulls profile).
-- n_bytes_out needs its own guard: DuckDB's least() IGNORES NULL
-- operands (least(NULL, 1024) = 1024) where Spark's propagates NULL.
SELECT doc_id,
       CASE WHEN text IS NULL THEN NULL ELSE 32 END AS width,
       CASE WHEN text IS NULL THEN NULL ELSE 32 END AS height,
       CASE WHEN text IS NULL THEN NULL
            ELSE CAST(least(octet_length(encode(text)), 1024) AS INT)
       END AS n_bytes_out
FROM documents
"""


# -- qid: media_frames ------------------------------------------------

def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd-frame sampling, max 4 frames/doc — the 1:N batch shape
    (frame fan-out happens inside the Arrow batch, no explode, no
    shuffle)."""
    d = attach_binary_payload(load(spark, sf_dir, "documents"))
    return sample_frames(d, frame_size=64, stride=2, max_frames=4)


SQL_MEDIA_FRAMES = """
WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents WHERE text IS NOT NULL),
f AS (
  SELECT doc_id, n,
         unnest(generate_series(0, CAST(ceil(n / 64.0) AS INT) - 1, 2)) AS frame_idx
  FROM p WHERE n > 0
)
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(least(64, n - frame_idx * 64) AS INT) AS frame_bytes
FROM (
  SELECT doc_id, n, frame_idx,
         row_number() OVER (PARTITION BY doc_id ORDER BY frame_idx) AS k
  FROM f
) WHERE k <= 4
"""


# -- qid: media_features ----------------------------------------------

def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload -> feature vector (the media-to-embedding step feeding
    the ANN operators), summarized to scalars for the hash compare
    (raw array columns break the driver's canonicalizer)."""
    d = attach_binary_payload(load(spark, sf_dir, "documents"))
    feat = extract_features(d, dim=8)
    sq_sum = F.aggregate(
        "features", F.lit(0.0), lambda acc, x: acc + x * x
    )
    return feat.select(
        "doc_id",
        pround(F.element_at("features", 1), 6).alias("f0"),
        pround(F.sqrt(sq_sum), 6).alias("f_norm"),
    )


SQL_MEDIA_FEATURES = """
-- no text filter: a NULL payload yields a row with NULL features
-- (missing-blob propagation), so the oracle keeps the row too
WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
SELECT doc_id,
       floor(CAST(n % 97 AS DOUBLE) / 97.0 * 1e6 + 0.5) / 1e6 AS f0,
       floor(sqrt(list_sum(list_transform(
           generate_series(1, 8),
           i -> (CAST((n * i) % 97 AS DOUBLE) / 97.0)
                * (CAST((n * i) % 97 AS DOUBLE) / 97.0)))) * 1e6 + 0.5) / 1e6 AS f_norm
FROM p
"""


# -- qid: media_decode_bmp (REAL decode kernel, no stub) --------------

def q_media_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode: synthesize a valid 24bpp BMP per document
    (raster = the text bytes, dimensions derived from byte length),
    then parse it back through the standard ``decode_media`` dispatch —
    the pure-stdlib codec path (operators/media_codecs.py), no fake.
    The oracle recomputes the header fields the encoder wrote (incl.
    4-byte row padding); the qid passes only if the decoder actually
    parsed them back out of the bytes."""
    import pandas as pd

    from oracle_to_oracle_data_integration_pipeline_spark.operators.media_codecs import (
        encode_bmp,
    )
    from oracle_to_oracle_data_integration_pipeline_spark.operators.multimodal import (
        decode_media,
    )

    # synth contract: a NULL document cannot be encoded into a payload
    # (fuzz find, nulls profile) — excluded on both sides
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )

    def batches(it):
        for pdf in it:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                b = t.encode("utf-8")
                w, h = len(b) % 31 + 1, len(b) % 17 + 1
                m = decode_media(encode_bmp(w, h, b))
                rows.append((doc_id, m["fmt"], m["width"], m["height"], m["n_bytes"]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "fmt", "width", "height", "n_bytes"]
            )

    return d.mapInPandas(
        batches, "doc_id long, fmt string, width int, height int, n_bytes int"
    )


SQL_MEDIA_DECODE_BMP = """
WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents WHERE text IS NOT NULL),
d AS (SELECT doc_id, n % 31 + 1 AS w, n % 17 + 1 AS h FROM p)
SELECT doc_id, 'bmp' AS fmt, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(54 + ((w * 3 + 3) // 4) * 4 * h AS INT) AS n_bytes
FROM d
"""


# PNG fixture geometry shared by every PNG-backed media qid: dims are
# derived from the byte length with these moduli; the oracle SQL strings
# interpolate the same constants, so there is one source of truth.
PNG_W_MOD, PNG_H_MOD = 29, 13


def _png_dims(b: bytes) -> tuple[int, int]:
    return len(b) % PNG_W_MOD + 1, len(b) % PNG_H_MOD + 1


# -- qid: media_decode_png (REAL decode incl. zlib inflate) -----------

def q_media_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-format decode: each document's bytes become the
    raster of a valid non-interlaced 8-bit RGB PNG whose rows cycle all
    five PNG filter types, then the payload is parsed back through the
    ``decode_media`` dispatch — chunk walk, IDAT zlib inflate, and full
    scanline unfiltering (pure stdlib, no imaging library).

    ``roundtrip_ok`` compares the unfiltered raster byte-for-byte to
    the input; the oracle expects TRUE everywhere, so a broken
    Sub/Up/Average/Paeth reconstruction fails the hash — n_bytes is
    deliberately NOT emitted (zlib stream size isn't SQL-computable)."""
    import pandas as pd

    from oracle_to_oracle_data_integration_pipeline_spark.operators.media_codecs import (
        encode_png,
        png_pixels,
    )
    from oracle_to_oracle_data_integration_pipeline_spark.operators.multimodal import (
        decode_media,
    )

    # synth contract: a NULL document cannot be encoded into a payload
    # (fuzz find, nulls profile) — excluded on both sides
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )

    def batches(it):
        for pdf in it:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                b = t.encode("utf-8")
                w, h = _png_dims(b)
                payload = encode_png(w, h, b)
                m = decode_media(payload)
                ok = png_pixels(payload) == b.ljust(w * h * 3, b"\x00")[: w * h * 3]
                rows.append((doc_id, m["fmt"], m["width"], m["height"], w * h * 3, ok))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "fmt", "width", "height", "raster_bytes", "roundtrip_ok"],
            )

    return d.mapInPandas(
        batches,
        "doc_id long, fmt string, width int, height int, raster_bytes int, roundtrip_ok boolean",
    )


SQL_MEDIA_DECODE_PNG = f"""
WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents WHERE text IS NOT NULL)
SELECT doc_id, 'png' AS fmt,
       CAST(n % {PNG_W_MOD} + 1 AS INT) AS width,
       CAST(n % {PNG_H_MOD} + 1 AS INT) AS height,
       CAST((n % {PNG_W_MOD} + 1) * (n % {PNG_H_MOD} + 1) * 3 AS INT) AS raster_bytes,
       TRUE AS roundtrip_ok
FROM p
"""


# -- qid: media_resize_real (REAL decode→resample→re-encode) ----------

def q_media_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full real media-resize path, no fake kernel anywhere:
    synthesize a PNG from the document bytes, DECODE it (zlib inflate +
    unfilter), nearest-neighbor resample the raster to 8×8, RE-ENCODE
    as PNG, and decode the result through the dispatch. The oracle
    recomputes every sampled byte of the resized raster from
    hex(encode(text)) — true UTF-8 byte reads, so the checksum only
    matches if decode, resample index arithmetic, and re-encode all
    round-trip exactly on ANY text (the earlier ascii(substr(...))
    form assumed byte == codepoint and broke on multi-byte documents
    — fuzz find, unicode profile)."""
    import pandas as pd

    from oracle_to_oracle_data_integration_pipeline_spark.operators.media_codecs import (
        encode_png,
        png_pixels,
        resize_nearest,
    )
    from oracle_to_oracle_data_integration_pipeline_spark.operators.multimodal import (
        decode_media,
    )

    # synth contract: a NULL document cannot be encoded into a payload
    # (fuzz find, nulls profile) — excluded on both sides
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )

    def batches(it):
        for pdf in it:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                b = t.encode("utf-8")
                w, h = _png_dims(b)
                pixels = png_pixels(encode_png(w, h, b))
                resized = resize_nearest(pixels, w, h, 8, 8)
                m = decode_media(encode_png(8, 8, resized))
                rows.append((doc_id, m["width"], m["height"], sum(resized)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "checksum"]
            )

    return d.mapInPandas(batches, "doc_id long, width int, height int, checksum long")


SQL_MEDIA_RESIZE_REAL = f"""
WITH p AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n,
         octet_length(encode(text)) % {PNG_W_MOD} + 1 AS w,
         octet_length(encode(text)) % {PNG_H_MOD} + 1 AS h
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, 8 AS width, 8 AS height,
       CAST(list_sum(list_transform(
         generate_series(0, 191),
         k -> CASE WHEN ((k // 24) * h // 8 * w + (k % 24) // 3 * w // 8) * 3 + k % 3 < n
                   THEN CAST(('0x' || substr(hx, 2 * (((k // 24) * h // 8 * w + (k % 24) // 3 * w // 8) * 3 + k % 3) + 1, 2)) AS INT)
                   ELSE 0 END)) AS BIGINT) AS checksum
FROM p
"""


# -- qid: media_decode_wav (REAL decode kernel, no stub) --------------

def q_media_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio parse: text bytes as 16-bit mono PCM at 8 kHz inside
    a valid RIFF/WAVE container, chunk-walked back by the stdlib codec.
    duration/frame accounting must round-trip exactly."""
    import pandas as pd

    from oracle_to_oracle_data_integration_pipeline_spark.operators.media_codecs import (
        decode_wav,
        encode_wav,
    )

    # synth contract: a NULL document cannot be encoded into a payload
    # (fuzz find, nulls profile) — excluded on both sides
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )

    def batches(it):
        for pdf in it:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                m = decode_wav(encode_wav(t.encode("utf-8"), sample_rate=8000))
                rows.append(
                    (doc_id, m["fmt"], m["sample_rate"], m["n_frames"], m["duration_ms"], m["n_bytes"])
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "fmt", "sample_rate", "n_frames", "duration_ms", "n_bytes"],
            )

    return d.mapInPandas(
        batches,
        "doc_id long, fmt string, sample_rate int, n_frames int, duration_ms int, n_bytes int",
    )


SQL_MEDIA_DECODE_WAV = """
WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents WHERE text IS NOT NULL),
d AS (SELECT doc_id, n - n % 2 AS pcm FROM p)
SELECT doc_id, 'wav' AS fmt, CAST(8000 AS INT) AS sample_rate,
       CAST(pcm // 2 AS INT) AS n_frames,
       CAST((pcm // 2) * 1000 // 8000 AS INT) AS duration_ms,
       CAST(44 + pcm AS INT) AS n_bytes
FROM d
"""


# -- qid: media_frames_real (REAL PCM frame slicing over WAV) ---------

def q_media_frames_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling with the REAL audio kernel: document bytes become
    16-bit mono PCM in a RIFF/WAVE container, the codec decodes it, and
    windows of 64 samples are sliced every 2nd window (max 4/doc) with
    an exact per-window sample sum. The oracle recomputes each SIGNED
    int16 sample (lo + 256·hi from true hex(encode(text)) byte reads,
    wrapped past 32767 — multi-byte UTF-8 high bytes ≥ 0x80 produce
    negative samples, which the earlier ASCII-assuming form missed:
    fuzz find, unicode profile) — a wrong slice boundary or byte
    order fails the hash. Same 1:N Arrow batch shape as the
    fake-kernel `media_frames`."""
    import struct as _struct

    import pandas as pd

    from oracle_to_oracle_data_integration_pipeline_spark.operators.media_codecs import (
        decode_wav,
        encode_wav,
    )

    # synth contract: a NULL document cannot be encoded into a payload
    # (fuzz find, nulls profile) — excluded on both sides
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )

    def batches(it):
        for pdf in it:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                b = t.encode("utf-8")
                payload = encode_wav(b)  # 16-bit mono: whole frames only
                m = decode_wav(payload)
                n_samples = m["n_frames"]
                pcm = b[: n_samples * 2]
                samples = _struct.unpack(f"<{n_samples}h", pcm)
                for k, win in enumerate(range(0, (n_samples + 63) // 64, 2)):
                    if k >= 4:
                        break
                    seg = samples[win * 64 : (win + 1) * 64]
                    rows.append((doc_id, win, len(seg), sum(seg)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "n_samples", "sample_sum"]
            )

    return d.mapInPandas(
        batches, "doc_id long, frame_idx int, n_samples int, sample_sum long"
    )


SQL_MEDIA_FRAMES_REAL = """
WITH p AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) // 2 AS n_samples
  FROM documents WHERE text IS NOT NULL
),
w AS (
  SELECT doc_id, hx, n_samples,
         unnest(generate_series(0, CAST(ceil(n_samples / 64.0) AS INT) - 1, 2)) AS win
  FROM p WHERE n_samples > 0
),
k AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY win) AS rk FROM w
)
SELECT doc_id, CAST(win AS INT) AS frame_idx,
       CAST(least(64, n_samples - win * 64) AS INT) AS n_samples,
       CAST(list_sum(list_transform(
         generate_series(win * 64, CAST(least((win + 1) * 64, n_samples) AS BIGINT) - 1),
         i -> ((CAST(('0x' || substr(hx, 4 * i + 1, 2)) AS INT)
                + 256 * CAST(('0x' || substr(hx, 4 * i + 3, 2)) AS INT)
                + 32768) % 65536) - 32768
       )) AS BIGINT) AS sample_sum
FROM k WHERE rk <= 4
"""


# -- qid: media_features_real (REAL raster channel stats over PNG) ----

def q_media_features_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction with the REAL image kernel: decode the
    synthesized PNG (zlib + unfilter) and compute per-channel (R,G,B)
    raster means — the media→feature step a training pipeline feeds to
    ANN, here with every byte recomputable by the oracle. Integer
    channel sums are exact; the mean divides once and rounds through
    the portable floor path."""
    import pandas as pd

    from oracle_to_oracle_data_integration_pipeline_spark.operators.media_codecs import (
        encode_png,
        png_pixels,
    )

    # synth contract: a NULL document cannot be encoded into a payload
    # (fuzz find, nulls profile) — excluded on both sides
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )

    def batches(it):
        import math

        for pdf in it:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                b = t.encode("utf-8")
                w, h = _png_dims(b)
                px = png_pixels(encode_png(w, h, b))
                n_px = w * h
                means = []
                for c in range(3):
                    s = sum(px[3 * j + c] for j in range(n_px))
                    means.append(math.floor(s / n_px * 1e6 + 0.5) / 1e6)
                rows.append((doc_id, *means))
            yield pd.DataFrame(rows, columns=["doc_id", "r_mean", "g_mean", "b_mean"])

    return d.mapInPandas(
        batches, "doc_id long, r_mean double, g_mean double, b_mean double"
    )


def _features_real_channel_sql(c: int) -> str:
    # true byte reads via hex(encode(text)) — ascii(substr(...)) gave
    # codepoints at character positions, valid only for ASCII text
    # (fuzz find, unicode profile)
    return f"""floor(CAST(list_sum(list_transform(
         generate_series(0, w * h - 1),
         j -> CASE WHEN 3 * j + {c} < n
                   THEN CAST(('0x' || substr(hx, 2 * (3 * j + {c}) + 1, 2)) AS INT)
                   ELSE 0 END
       )) AS DOUBLE) / (w * h) * 1e6 + 0.5) / 1e6"""


SQL_MEDIA_FEATURES_REAL = f"""
WITH p AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n,
         octet_length(encode(text)) % {PNG_W_MOD} + 1 AS w,
         octet_length(encode(text)) % {PNG_H_MOD} + 1 AS h
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       {_features_real_channel_sql(0)} AS r_mean,
       {_features_real_channel_sql(1)} AS g_mean,
       {_features_real_channel_sql(2)} AS b_mean
FROM p
"""


# -- qid: embed_quantize ----------------------------------------------

def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 symmetric quantization of the embeddings table, summarized
    per vector as (first quantized value, max reconstruction error) —
    scalars, because raw arrays break the driver canonicalizer."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.similarity import (
        quantize_embeddings,
    )

    e = load(spark, sf_dir, "embeddings")
    # keep_vec: reconstruction error needs qvec AND the source vector —
    # carrying it through keeps this one zero-shuffle projection (no
    # join-back, no second scan / HOF re-evaluation)
    q = quantize_embeddings(e, keep_vec=True)
    err = F.array_max(
        F.zip_with(
            "qvec",
            "embedding",
            lambda qi, xi: F.abs(qi.cast("double") / F.col("scale") - xi),
        )
    )
    return q.select(
        "vec_id",
        F.element_at("qvec", 1).alias("q0"),
        # pround, not round(): portable half-up on a raw double (see
        # _util.pround — round() is engine-specific at the .5 boundary)
        F.when(F.col("scale") > 0, pround(err, 6)).otherwise(F.lit(0.0)).alias("max_abs_err"),
    )


SQL_EMBED_QUANTIZE = """
WITH s AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(x))) AS maxabs
  FROM embeddings
),
q AS (
  -- 127e0 / CAST(maxabs AS DOUBLE), not 127.0 / maxabs: DuckDB parses
  -- 127.0 as DECIMAL and DECIMAL/FLOAT division yields FLOAT, giving a
  -- float-precision scale where Spark computes double(127)/double(maxabs)
  -- (surfaced as a 6th-decimal max_abs_err flip at sf0.1). The float
  -- maxabs widens to double exactly, so both engines now divide
  -- identical operands.
  SELECT vec_id, embedding,
         CASE WHEN maxabs > 0 THEN 127e0 / CAST(maxabs AS DOUBLE) ELSE 0e0 END AS scale
  FROM s
)
SELECT vec_id,
       CAST(floor(embedding[1] * scale + 0.5) AS INT) AS q0,
       -- the transform runs over CAST(embedding AS DOUBLE[]): DuckDB
       -- narrows a lambda's result list to the INPUT element type, so
       -- a FLOAT[] input would round each per-element error to float
       -- before list_max while Spark keeps doubles (a real 6th-decimal
       -- flip surfaced at sf0.1). float→double widening is exact, so
       -- the quantization arithmetic itself is unchanged.
       -- floor(x*1e6+0.5)/1e6 (not round): portable half-up — round()
       -- on a double is engine-specific at the .5 boundary (see
       -- queries/_util.pround)
       CASE WHEN scale > 0 THEN floor(list_max(list_transform(
           CAST(embedding AS DOUBLE[]),
           x -> abs(CAST(floor(x * scale + 0.5) AS BIGINT) / scale - x))) * 1e6 + 0.5) / 1e6
            ELSE 0.0 END AS max_abs_err
FROM q
"""


# -- qid: chunk_docs --------------------------------------------------

def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (20-token chunks, 5-token overlap) —
    pure HOF expression pipeline, no shuffle, no UDF
    (operators/chunking.py)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.chunking import (
        chunk_documents,
    )

    d = load(spark, sf_dir, "documents")
    return chunk_documents(d, chunk_tokens=20, overlap=5)


SQL_CHUNK_DOCS = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents WHERE trim(text) <> ''
),
n AS (
  SELECT doc_id, toks, len(toks) AS n,
         CASE WHEN len(toks) <= 20 THEN 1
              ELSE CAST(ceil((len(toks) - 20) / 15.0) AS INT) + 1 END AS n_chunks
  FROM t
),
c AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, n_chunks - 1)) AS chunk_id
  FROM n
)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       CAST(len(list_slice(toks, chunk_id * 15 + 1, chunk_id * 15 + 20)) AS INT) AS n_tokens,
       array_to_string(list_slice(toks, chunk_id * 15 + 1, chunk_id * 15 + 20), ' ') AS chunk_text
FROM c
"""


# -- qid: pack_sequences ----------------------------------------------

def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-split packing of documents into 256-token training
    sequences, sharded by source so no global ordering exists
    (operators/chunking.py pack_sequences)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.chunking import (
        pack_sequences,
    )

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        # nullif(-1): size(NULL)=-1 would poison per-source token sums
        # (fuzz find, nulls profile); the SQL twin yields NULL naturally
        F.nullif(F.size(F.split(F.trim("text"), r"\s+")), F.lit(-1)).alias("n_tokens")
    )
    packed = pack_sequences(
        d, "n_tokens", capacity=256, shard_cols=["source"], order_cols=["doc_id"]
    )
    # "offset" is a reserved word in DuckDB — alias for the oracle twin
    return packed.select(
        "doc_id", "source", F.col("offset").alias("tok_offset"), "seq_id", "spill_tokens"
    )


SQL_PACK_SEQUENCES = """
WITH t AS (
  SELECT doc_id, source,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
  FROM documents
),
o AS (
  SELECT doc_id, source, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
  FROM t
)
SELECT doc_id, source, tok_offset,
       CAST(floor(tok_offset / 256.0) AS BIGINT) AS seq_id,
       CAST(greatest(0, (tok_offset % 256) + n_tokens - 256) AS BIGINT) AS spill_tokens
FROM o
"""


# -- qid: media_decode_mp4 (REAL container parse, no stub) ------------

# MP4 fixture geometry: dims/audio-arm derived from the byte length;
# the oracle interpolates the same constants. The no-payload file
# sizes are pure functions of the track count, computed ONCE from the
# encoder itself so the oracle's n_bytes cannot drift from the codec.
MP4_W_MOD, MP4_H_MOD = 37, 21


def _mp4_base(audio: bool) -> int:
    from oracle_to_oracle_data_integration_pipeline_spark.operators.media_codecs import encode_mp4

    return len(encode_mp4(1, 1, 1, audio, b""))


_MP4_BASE_V = _mp4_base(False)
_MP4_BASE_AV = _mp4_base(True)


def q_media_decode_mp4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container decode: each document's bytes become the
    mdat payload of a structurally valid ISO BMFF file (duration = the
    byte count in ms, dims from length moduli, every third doc gains
    an audio track), then the payload is parsed back through the
    ``decode_media``-adjacent box walk (media_codecs.decode_mp4 —
    validated box sizes, mvhd/tkhd/hdlr parse, pure stdlib). FRAME
    decode remains the documented codec stub; this is the container
    surface a routing/dedup/corpus-stats pass actually reads."""
    import pandas as pd

    from oracle_to_oracle_data_integration_pipeline_spark.operators.media_codecs import (
        decode_mp4,
        encode_mp4,
    )

    # synth contract: a NULL document cannot be encoded into a payload
    # (fuzz find, nulls profile) — excluded on both sides
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )

    def batches(it):
        for pdf in it:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                b = t.encode("utf-8")
                n = len(b)
                payload = encode_mp4(
                    duration_ms=n,
                    width=n % MP4_W_MOD + 1,
                    height=n % MP4_H_MOD + 1,
                    audio=(n % 3 == 0),
                    mdat=b,
                )
                m = decode_mp4(payload)
                rows.append(
                    (
                        doc_id,
                        "mp4",
                        m["width"],
                        m["height"],
                        m["duration_ms"],
                        m["n_tracks"],
                        m["handlers"],
                        m["n_bytes"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "width", "height",
                    "duration_ms", "n_tracks", "handlers", "n_bytes",
                ],
            )

    return d.mapInPandas(
        batches,
        "doc_id long, fmt string, width int, height int, "
        "duration_ms long, n_tracks int, handlers string, n_bytes int",
    )


SQL_MEDIA_DECODE_MP4 = f"""
WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents WHERE text IS NOT NULL)
SELECT doc_id, 'mp4' AS fmt,
       CAST(n % {MP4_W_MOD} + 1 AS INT) AS width,
       CAST(n % {MP4_H_MOD} + 1 AS INT) AS height,
       CAST(n AS BIGINT) AS duration_ms,
       CAST(CASE WHEN n % 3 = 0 THEN 2 ELSE 1 END AS INT) AS n_tracks,
       CASE WHEN n % 3 = 0 THEN 'vide,soun' ELSE 'vide' END AS handlers,
       CAST(CASE WHEN n % 3 = 0 THEN {_MP4_BASE_AV} ELSE {_MP4_BASE_V} END
            + n AS INT) AS n_bytes
FROM p
"""
SQL_MEDIA_DECODE_MP4 = SQL_MEDIA_DECODE_MP4.format(
    MP4_W_MOD=MP4_W_MOD,
    MP4_H_MOD=MP4_H_MOD,
    _MP4_BASE_AV=_MP4_BASE_AV,
    _MP4_BASE_V=_MP4_BASE_V,
)


QUERIES = {
    "media_resize": q_media_resize,
    "media_frames": q_media_frames,
    "media_features": q_media_features,
    "media_decode_bmp": q_media_decode_bmp,
    "media_decode_mp4": q_media_decode_mp4,
    "media_decode_png": q_media_decode_png,
    "media_resize_real": q_media_resize_real,
    "media_frames_real": q_media_frames_real,
    "media_features_real": q_media_features_real,
    "media_decode_wav": q_media_decode_wav,
    "embed_quantize": q_embed_quantize,
    "chunk_docs": q_chunk_docs,
    "pack_sequences": q_pack_sequences,
}

ORACLE_SQL = {
    "media_resize": SQL_MEDIA_RESIZE,
    "media_frames": SQL_MEDIA_FRAMES,
    "media_features": SQL_MEDIA_FEATURES,
    "media_decode_bmp": SQL_MEDIA_DECODE_BMP,
    "media_decode_mp4": SQL_MEDIA_DECODE_MP4,
    "media_decode_png": SQL_MEDIA_DECODE_PNG,
    "media_resize_real": SQL_MEDIA_RESIZE_REAL,
    "media_frames_real": SQL_MEDIA_FRAMES_REAL,
    "media_features_real": SQL_MEDIA_FEATURES_REAL,
    "media_decode_wav": SQL_MEDIA_DECODE_WAV,
    "embed_quantize": SQL_EMBED_QUANTIZE,
    "chunk_docs": SQL_CHUNK_DOCS,
    "pack_sequences": SQL_PACK_SEQUENCES,
}
