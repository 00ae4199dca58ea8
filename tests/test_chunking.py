"""Chunking/packing operators (operators/chunking.py): sliding-window
coverage, overlap, blank-doc handling, straddle bookkeeping."""

from __future__ import annotations

import pytest

from oracle_to_oracle_data_integration_pipeline_spark.operators.chunking import (
    chunk_documents,
    pack_sequences,
)


def _doc(spark, *texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_chunk_short_doc_single_chunk(spark):
    out = chunk_documents(_doc(spark, "a b c"), chunk_tokens=5, overlap=2).collect()
    assert len(out) == 1
    assert (out[0]["chunk_id"], out[0]["n_tokens"], out[0]["chunk_text"]) == (0, 3, "a b c")


def test_chunk_sliding_window_covers_all_tokens_with_overlap(spark):
    # 7 tokens, chunk=4, overlap=2 -> stride 2 -> chunks [0..3],[2..5],[4..6]
    text = "t0 t1 t2 t3 t4 t5 t6"
    out = sorted(
        (r["chunk_id"], r["chunk_text"])
        for r in chunk_documents(_doc(spark, text), chunk_tokens=4, overlap=2).collect()
    )
    assert out == [
        (0, "t0 t1 t2 t3"),
        (1, "t2 t3 t4 t5"),
        (2, "t4 t5 t6"),
    ]


def test_chunk_blank_doc_produces_no_rows(spark):
    out = chunk_documents(_doc(spark, "   ", "x y"), chunk_tokens=4, overlap=1).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_chunk_rejects_overlap_ge_chunk(spark):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(_doc(spark, "a"), chunk_tokens=4, overlap=4)


def test_pack_sequences_offsets_and_straddle(spark):
    df = spark.createDataFrame(
        [("s", 1, 60), ("s", 2, 60), ("s", 3, 30), ("t", 1, 250)],
        "source string, doc_id long, n_tokens long",
    )
    out = {
        (r["source"], r["doc_id"]): (r["offset"], r["seq_id"], r["spill_tokens"])
        for r in pack_sequences(
            df, "n_tokens", capacity=100, shard_cols=["source"], order_cols=["doc_id"]
        ).collect()
    }
    # shard s: offsets 0,60,120; doc2 starts at 60, ends at 120 -> spills 20
    assert out[("s", 1)] == (0, 0, 0)
    assert out[("s", 2)] == (60, 0, 20)
    assert out[("s", 3)] == (120, 1, 0)
    # shard t packs independently; 250 tokens from offset 0 spill 150
    assert out[("t", 1)] == (0, 0, 150)


def test_pack_sequences_no_global_shuffle(spark):
    """The window must partition by the shard key — no single-partition
    global sort exchange."""
    df = spark.createDataFrame(
        [("s", 1, 10)], "source string, doc_id long, n_tokens long"
    )
    plan = (
        pack_sequences(df, "n_tokens", 100, ["source"], ["doc_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan
