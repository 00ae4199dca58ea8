"""Document chunking and sequence packing — the two verbs that turn a
curated corpus into model-ready training sequences.

The reference moves rows; an LLM-data pipeline at 100 TB also has to
reshape them: split long documents into overlapping context-window
chunks, then pack variable-length pieces into fixed-capacity training
sequences (the standard concat-then-split-at-max-len packing used in
pretraining — sequences may straddle document boundaries by design).

Scale design:
- ``chunk_documents`` is a pure row-local HOF expression pipeline
  (split → sequence → explode → slice): no shuffle, no UDF, whole-stage
  codegen end to end. Output grows by the chunk fan-out factor only.
- ``pack_sequences`` needs a running token offset, which is a window —
  a GLOBAL window would single-partition 100 TB, so packing is sharded:
  the window partitions by ``shard_cols`` (a natural key like source /
  date, or a hash-derived shard) and orders within the shard. Shards
  pack independently and in parallel; one sequence never spans shards,
  which costs at most one partial sequence of waste per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window chunking over whitespace tokens: chunk ``i``
    covers tokens ``[i*stride, i*stride + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap``; the last chunk may be short.
    ``n_chunks = 1`` if the doc fits, else ``ceil((n - chunk_tokens) /
    stride) + 1`` (every token is covered, chunks overlap by
    ``overlap``).

    Output: (id_col, chunk_id, n_tokens, chunk_text) — one row per
    chunk, empty/whitespace-only docs produce no rows.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    # filter BEFORE splitting: split("") is [""] (size 1) on both
    # engines, which would fabricate one empty chunk per blank doc
    df = df.filter(F.trim(F.col(text_col)) != "")
    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(tokens)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)).cast("int") + F.lit(1)
    )
    chunk = F.slice(
        F.col("__tokens"), F.col("chunk_id") * stride + 1, chunk_tokens
    )
    return (
        df.select(
            id_col,
            tokens.alias("__tokens"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size(chunk).cast("int").alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


def pack_sequences(
    df: DataFrame,
    tokens_col: str,
    capacity: int,
    shard_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Concat-then-split sequence packing: pieces are laid end to end
    in ``order_cols`` order within each ``shard_cols`` shard, and the
    token stream is cut every ``capacity`` tokens. A piece whose span
    crosses a cut belongs to the sequence where it STARTS (``seq_id =
    floor(offset / capacity)``) and records how many of its tokens
    spill into the next sequence — exactly the bookkeeping a packed
    pretraining loader needs.

    Output: input columns + (offset, seq_id, spill_tokens). The window
    is per-shard — no global ordering, shards pack in parallel.
    """
    w = (
        Window.partitionBy(*shard_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    out = df.withColumn("offset", offset.cast("bigint"))
    end_in_seq = (F.col("offset") % capacity) + F.col(tokens_col)
    spill = F.greatest(F.lit(0), end_in_seq - F.lit(capacity))
    return out.withColumn(
        "seq_id", F.floor(F.col("offset") / capacity).cast("bigint")
    ).withColumn("spill_tokens", spill.cast("bigint"))
