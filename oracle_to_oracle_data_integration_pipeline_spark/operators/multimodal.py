"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

The Spark-side machinery here is real and tested: binary columns,
schema contracts, per-partition batch iteration, deterministic
metadata extraction. The actual media decoding is STUBBED — the
image/audio libraries are not in this container — behind
``decode_media`` which raises ``NotImplementedError`` unless
``fake=True`` (the deterministic fake used by tests/oracles). Swapping
the stub for PIL/ffmpeg changes only the inner function; the Spark
plumbing (batch shape, schema, partitioning) is unchanged.

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


def decode_media(payload: bytes, fake: bool = False) -> dict:
    """Decode one media payload to metadata.

    STUB: real decoding needs PIL/av/soundfile (absent here). The
    deterministic fake derives metadata from the byte length so tests
    and SQL oracles can verify the full pipeline shape.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires imaging/audio libraries not present in this "
            "environment; pass fake=True for the deterministic stub"
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

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            metas = [decode_media(p, fake=fake) for p in pdf["payload"]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[["doc_id", "n_bytes", "width", "height", "fmt"]]

    return df_with_payload.mapInPandas(batches, schema=META_SCHEMA)
