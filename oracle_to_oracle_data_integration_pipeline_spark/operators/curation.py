"""Corpus-curation operators: passage-level dedup, semantic dedup,
mixture sampling, token-budget selection, incremental dedup.

The reference (a CDC replicator, /root/reference/scripts/03_cdc_etl.py)
moves rows between databases; a pretraining-data pipeline additionally
curates them. These five verbs are the published curation toolbox
re-expressed as Spark column algebra:

- ``passage_dedup`` — exact repeated-passage removal at block
  granularity (Lee et al. 2022, "Deduplicating Training Data Makes
  Language Models Better"): duplicated spans are removed everywhere
  except their canonical first occurrence.
- ``semantic_dedup`` — SemDeDup (Abbas et al. 2023): cluster the
  embedding space, drop near-identical pairs WITHIN a cluster only,
  so the pair computation never goes quadratic in the corpus.
- ``mixture_sample`` — domain-mixture reweighting: deterministic
  per-source Bernoulli rates chosen so each source contributes its
  target share of a global token budget.
- ``budget_select`` — "best docs until the budget is full": a
  histogram-threshold selection that needs NO global sort.
- ``dedup_incremental`` — new-batch-vs-existing-corpus dedup as a
  left-anti join on content identity.

Scale notes per operator are in the docstrings; the shared principle:
every shuffle is keyed by something high-cardinality (block text,
cluster id, source, score bucket), every small side is broadcast, and
nothing ever sorts or collects the full corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.chunking import chunk_documents
from oracle_to_oracle_data_integration_pipeline_spark.operators.similarity import (
    _cosine_from_norms,
    norm_col,
)


def passage_dedup(
    df: DataFrame,
    block_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove corpus-wide repeated passages, keeping each passage's
    canonical first occurrence (lowest ``(doc_id, chunk_id)``).

    Passages are non-overlapping ``block_tokens``-token blocks
    (``chunk_documents`` with overlap=0) — the block quantization of
    exact-substring dedup: any repeated span ≥ 2·block_tokens tokens is
    guaranteed to share at least one aligned block. On corpora with
    real structure, split on paragraphs instead by pre-exploding and
    feeding one paragraph per row.

    Scale: one shuffle keyed by block text (window over
    ``partitionBy(chunk_text)``) — high-cardinality, skew-free unless a
    single passage dominates the corpus, which is exactly the passage
    you want deduped; then one groupBy(doc) to reassemble. No global
    sort, no driver state.

    Output: (id_col, n_blocks, n_kept, clean_text) for every input doc
    with non-blank text; a doc whose every block was dropped still
    appears with n_kept = 0 and clean_text = ''.
    """
    blocks = chunk_documents(
        df, text_col=text_col, id_col=id_col, chunk_tokens=block_tokens, overlap=0
    )
    w = Window.partitionBy("chunk_text").orderBy(id_col, "chunk_id")
    flagged = blocks.withColumn("__occ__", F.row_number().over(w))
    kept_struct = F.when(
        F.col("__occ__") == 1, F.struct("chunk_id", "chunk_text")
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_blocks"),
            F.count(kept_struct).cast("int").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda s: s["chunk_text"]
                ),
                " ",
            ).alias("clean_text"),
        )
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup: assign every vector to its nearest centroid, then mark
    a vector as a semantic duplicate iff some LOWER-id vector in the
    SAME cell has cosine ≥ threshold with it. Only within-cell pairs
    are ever scored, so cost is Σ|cell|² — controlled by n_cells — not
    |corpus|².

    ``centroids`` is any small (cid, cvec) table (production: an
    offline k-means fit); when omitted the ``n_cells`` lowest-id
    vectors seed the cells, keeping the operator deterministic and
    oracle-checkable (same convention as ``similarity.ivf_topk``).

    Scale: centroid assignment is a broadcast (C centroids) against the
    corpus — map-side only; the pair join shuffles by cell id. Cosines
    are rounded to 6 decimals BEFORE ranking/thresholding on both
    engines so a 1-ulp difference can't flip a cell assignment or a
    keep decision.

    Output: (vec_id, cid, kept) for every input vector.
    """
    if centroids is None:
        centroids = (
            embeddings.orderBy(F.col(id_col))
            .limit(n_cells)
            .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        )
    cent = F.broadcast(
        centroids.select("cid", "cvec", norm_col("cvec").alias("centn"))
    )
    scored = (
        embeddings.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("v"),
            norm_col(vec_col).alias("vn"),
        )
        .join(cent)
        .select(
            "vid",
            "v",
            "vn",
            "cid",
            F.round(
                _cosine_from_norms("v", "cvec", "vn", "centn"), 6
            ).alias("c_cos"),
        )
    )
    w = Window.partitionBy("vid").orderBy(F.col("c_cos").desc(), F.col("cid"))
    # cells feeds THREE consumers (both self-join sides + the final
    # keep join) and Catalyst does not dedupe common subplans, so the
    # scan + C cosines + top-1 window re-ran per consumer; persist it
    # (registry-tracked, one live copy per session) and materialize
    # with ONE uncontended action before the multi-branch plan runs —
    # the neardup_pairs_lsh convoy fix (round 11). The window's own
    # exchange by vid already parallelizes a single-file input.
    from oracle_to_oracle_data_integration_pipeline_spark.operators.cache_registry import (
        persist_tracked,
    )

    cells = persist_tracked(
        scored.withColumn("__r__", F.row_number().over(w))
        .filter(F.col("__r__") == 1)
        .select("vid", "v", "vn", "cid"),
        "curation_semdedup",
        replace=True,
    )
    cells.count()
    a, b = cells.alias("a"), cells.alias("b")
    dup_ids = (
        a.join(b, (F.col("a.cid") == F.col("b.cid")) & (F.col("a.vid") < F.col("b.vid")))
        .filter(
            F.round(
                _cosine_from_norms("a.v", "b.v", "a.vn", "b.vn"),
                6,
            )
            >= threshold
        )
        .select(F.col("b.vid").alias("vid"))
        .distinct()
    )
    return (
        cells.join(dup_ids.withColumn("__dup__", F.lit(True)), "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            "cid",
            F.coalesce(~F.col("__dup__"), F.lit(True)).alias("kept"),
        )
    )


def _ppm_col(key: Column) -> Column:
    """Engine-portable uniform bucket in [0, 1e6): first 32 bits of
    md5 mod 1e6 — ``sampling.hash_bucket_col`` (16 bits) cannot express
    parts-per-million rates, so this widens the prefix. DuckDB twin:
    ``CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8)) AS BIGINT)
    % 1000000``.
    """
    h32 = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    return h32 % 1_000_000


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    tokens_col: str = "n_tokens",
    source_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 1.0,
) -> DataFrame:
    """Domain-mixture sampling: source ``s`` gets a target share
    ``weight_s / Σweights`` of ``token_budget`` tokens, and its docs are
    kept by a deterministic Bernoulli with rate
    ``min(1, target_s / available_s)`` — the standard mixture-weighting
    step before pretraining (cf. DoReMi / The Pile's per-source
    epochs), with md5-bucket determinism instead of rand() so reruns
    and engine changes keep the same rows.

    Σweights is computed over the sources ACTUALLY PRESENT (absent
    weight keys contribute nothing; unlisted sources get
    ``default_weight``), so shares always total 1.

    Scale: per-source token totals are one groupBy over ~#sources keys;
    the rate table is tiny and broadcast back; the keep decision is a
    map-side expression (md5 ppm bucket vs rate). No global ordering.

    Output: kept rows + (rate_ppm BIGINT) — the applied parts-per-
    million keep rate for that source.
    """
    wexpr = F.lit(float(default_weight))
    for src, wt in weights.items():
        wexpr = F.when(F.col(source_col) == src, F.lit(float(wt))).otherwise(wexpr)
    avail = (
        df.groupBy(source_col)
        .agg(F.sum(F.col(tokens_col)).cast("bigint").alias("__avail__"))
        .withColumn("__w__", wexpr)
    )
    wsum = avail.agg(F.sum("__w__").alias("s"))
    rates = (
        avail.crossJoin(F.broadcast(wsum))
        .select(
            source_col,
            F.least(
                F.lit(1_000_000).cast("bigint"),
                F.floor(
                    (F.col("__w__") / F.col("s"))
                    * F.lit(float(token_budget))
                    * 1_000_000.0
                    / F.col("__avail__")
                ).cast("bigint"),
            ).alias("rate_ppm"),
        )
    )
    return _apply_ppm_gate(df, rates, source_col, id_col)


def _apply_ppm_gate(
    df: DataFrame, rates: DataFrame, source_col: str, id_col: str
) -> DataFrame:
    """Shared keep-decision for the mixture operators: broadcast the
    tiny per-source rate table and gate each row by its md5-ppm bucket.
    One place, so the two mixture schedules can never diverge on HOW
    a rate is applied."""
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(_ppm_col(F.col(id_col)) < F.col("rate_ppm"))
    )


def budget_select(
    df: DataFrame,
    score_col: str,
    token_budget: int,
    tokens_col: str = "n_tokens",
    bucket_decimals: int = 3,
) -> DataFrame:
    """Keep the highest-quality docs until a token budget is filled —
    WITHOUT a global sort. Scores are quantized to
    ``10^-bucket_decimals`` buckets; per-bucket token totals (a tiny
    aggregate) are cumulated from the best bucket down, and every
    bucket whose cumulative total fits within the budget is kept
    whole. Selection is at bucket granularity: the first bucket that
    would overflow the budget is dropped entirely (bounded
    undershoot), which keeps the operator deterministic and
    rank-stable — no tiebreak inside a bucket ever matters.

    Scale: one groupBy over ≤ 10^bucket_decimals keys, one window over
    that tiny aggregate (driver-scale, not corpus-scale), one broadcast
    semi-join back. The corpus itself is never sorted.

    Output: input columns + (score_bucket INT, bucket_tokens BIGINT)
    for kept rows.
    """
    p = 10**bucket_decimals
    bucket = F.floor(F.col(score_col) * p).cast("int")
    with_b = df.withColumn("score_bucket", bucket)
    agg = with_b.groupBy("score_bucket").agg(
        F.sum(F.col(tokens_col)).cast("bigint").alias("bucket_tokens")
    )
    w = Window.orderBy(F.col("score_bucket").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    kept_buckets = (
        agg.withColumn("__cum__", F.sum("bucket_tokens").over(w))
        .filter(F.col("__cum__") <= token_budget)
        .select("score_bucket", "bucket_tokens")
    )
    return with_b.join(F.broadcast(kept_buckets), "score_bucket")


def global_order_index(
    df: DataFrame,
    id_col: str = "doc_id",
    buckets: int = 256,
    out_col: str = "position",
) -> DataFrame:
    """Deterministic pseudo-random global permutation index 0..N-1 —
    "shuffle the corpus before training" as a reproducible column, not
    an order-by. Semantically identical to
    ``row_number() OVER (ORDER BY md5(id), id) - 1``, but a global
    window would single-partition 100 TB, so this is the classic
    two-pass distributed order index:

    1. bucket every row by a MONOTONIC range split of its md5 key's
       16-bit prefix — ``bucket = prefix16 * buckets DIV 65536``
       (``buckets`` ≤ 65536 histogram cells). Monotonicity is the
       correctness condition: a modulo here would interleave key
       ranges across buckets and silently break the global order for
       any bucket count other than 16^ndigits;
    2. count rows per bucket — a tiny aggregate — and prefix-sum it
       into per-bucket offsets (window over ≤``buckets`` rows,
       driver-scale);
    3. rank within each bucket in parallel (window keyed by bucket)
       and add the broadcast bucket offset.

    Because the bucket is a monotonic function of the sort key's
    prefix, ordering by (bucket, key, id) equals ordering by
    (key, id): the two-pass index is exactly the global rank — for
    EVERY bucket count (property-tested buckets ∈ {1, 256, 4096}).
    Writers then ``repartitionByRange`` on ``out_col`` to lay
    training shards out in shuffled order.

    Output: input columns + (out_col BIGINT) in [0, N).
    """
    if not 1 <= buckets <= 65536:
        raise ValueError("buckets must be in [1, 65536]")
    key = F.md5(F.col(id_col).cast("string"))
    prefix16 = F.conv(F.substring("__key__", 1, 4), 16, 10).cast("bigint")
    b = df.withColumn("__key__", key).withColumn(
        "__bucket__",
        F.floor((prefix16 * buckets) / F.lit(65536)).cast("int"),
    )
    wb = Window.orderBy("__bucket__").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        b.groupBy("__bucket__")
        .agg(F.count("*").alias("__n__"))
        .select(
            "__bucket__",
            F.coalesce(F.sum("__n__").over(wb), F.lit(0)).cast("bigint").alias("__off__"),
        )
    )
    win = Window.partitionBy("__bucket__").orderBy("__key__", id_col)
    return (
        b.join(F.broadcast(offsets), "__bucket__")
        .withColumn(out_col, (F.col("__off__") + F.row_number().over(win) - 1).cast("bigint"))
        .drop("__key__", "__bucket__", "__off__")
    )


def domain_cap(
    df: DataFrame,
    cap: int,
    source_col: str = "source",
    order_col: str = "quality",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frequency cap: keep at most ``cap`` docs per source, preferring
    the highest ``order_col`` (ties broken by id) — the guard against
    any single domain dominating the mixture, complementing
    ``mixture_sample``'s rate-based reweighting with a hard ceiling.

    Scale: one shuffle keyed by source for a rank-k-per-group window.
    A pathologically hot source concentrates its rows on one task, but
    only until rank > cap rows are discarded; for extreme skew,
    pre-filter with an approximate per-source count and salt the
    window's sort (two-phase top-k) — not needed at fixture scale.

    Output: kept rows + (domain_rank INT), rank 1 = best in source.
    """
    w = Window.partitionBy(source_col).orderBy(F.col(order_col).desc(), F.col(id_col))
    return (
        df.withColumn("domain_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("domain_rank") <= cap)
    )


def dedup_incremental(
    new_df: DataFrame,
    seen_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental (cross-corpus) exact dedup: drop new docs whose text
    already exists in the seen corpus — the arriving-batch counterpart
    of ``dedup.exact_dedup_groups``.

    Scale: left-anti hash join keyed by xxhash64(text) — the seen side
    ships only (hash, text) pairs, 8 bytes + text per row; with a
    pre-deduped seen corpus this is the minimal-width anti join. The
    join condition includes the text itself so a 64-bit hash collision
    can never drop a genuinely-new doc.

    Output: surviving new rows, unchanged schema.
    """
    h = F.xxhash64(F.col(text_col))
    n = new_df.withColumn("__h__", h)
    s = seen_df.select(h.alias("__h__"), F.col(text_col).alias("__t__")).distinct()
    return (
        n.join(
            s,
            (n["__h__"] == s["__h__"]) & (n[text_col] == s["__t__"]),
            "left_anti",
        ).drop("__h__")
    )


def mixture_temperature(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based source rebalancing (the multilingual-BERT /
    T5 alpha-sampling recipe at alpha = 0.5): target share
    p_s ∝ √n_s, materialized at the largest size needing no
    upsampling. The whole schedule collapses algebraically to
    keep-rate_s = √(n_min / n_s) — the smallest source is kept whole
    and every larger source is downsampled by the square-root ratio,
    flattening the size distribution exactly like temperature 0.5.

    alpha is fixed at 0.5 deliberately: IEEE 754 requires sqrt to be
    correctly rounded, so the ppm rates are bit-identical in any
    engine; a general alpha would route through pow(), whose libm
    rounding is not portable. Per-source counts are one tiny groupBy;
    the keep decision is the same map-side md5-ppm gate as
    :func:`mixture_sample`.

    Output: one summary row per source
    (source, n_docs, rate_ppm, n_kept).
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).cast("long").alias("n"))
    nmin = counts.agg(F.min("n").alias("nmin"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        source_col,
        F.col("n").alias("n_docs"),
        F.floor(
            F.sqrt(F.col("nmin").cast("double") / F.col("n").cast("double"))
            * 1_000_000.0
        )
        .cast("bigint")
        .alias("rate_ppm"),
    )
    kept = (
        _apply_ppm_gate(df, rates.select(source_col, "rate_ppm"), source_col, id_col)
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, source_col, "left")
        .select(
            source_col,
            "n_docs",
            "rate_ppm",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
    )


def shard_plan(
    df: DataFrame,
    budget: int,
    size_col: str = "n_chars",
    id_col: str = "doc_id",
    buckets: int = 256,
) -> DataFrame:
    """Byte-budget shard assignment: lay the corpus out in the
    deterministic md5-shuffled order (same order as
    ``global_order_index``) and assign each doc to the shard where its
    first byte lands, shards being consecutive ``budget``-byte windows
    of the cumulative size — the planning step behind "write the
    training set as ~N-byte files in shuffled order". Semantically
    ``shard = (sum of size over all docs strictly before me) DIV
    budget`` — but a global cumulative-sum window would
    single-partition 100 TB, so this reuses the two-pass order-index
    machinery with SUM(size) in place of COUNT:

    1. bucket by the MONOTONIC md5-prefix range split (monotonicity
       makes per-bucket order concatenate into the global order);
    2. per-bucket byte totals → exclusive prefix sum over the ≤
       ``buckets``-row histogram (window_audit-whitelisted) →
       broadcast offsets;
    3. bucket-keyed exclusive cumsum window + offset = exact global
       ``cum_before``; shard id and the doc's offset inside its shard
       are pure integer arithmetic from there (no float division —
       exact past 2^53).

    Rows with NULL or non-positive size are excluded (a doc with no
    bytes has no shard). Output: id, size (as doc_bytes), cum_before,
    shard, offset_in_shard — all BIGINT.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if not 1 <= buckets <= 65536:
        raise ValueError("buckets must be in [1, 65536]")
    d = df.filter(F.col(size_col).isNotNull() & (F.col(size_col) > 0)).select(
        F.col(id_col), F.col(size_col).cast("bigint").alias("__sz__")
    )
    key = F.md5(F.col(id_col).cast("string"))
    prefix16 = F.conv(F.substring("__key__", 1, 4), 16, 10).cast("bigint")
    b = d.withColumn("__key__", key).withColumn(
        "__bucket__",
        F.floor((prefix16 * buckets) / F.lit(65536)).cast("int"),
    )
    wb = Window.orderBy("__bucket__").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        b.groupBy("__bucket__")
        .agg(F.sum("__sz__").alias("__b__"))
        .select(
            "__bucket__",
            F.coalesce(F.sum("__b__").over(wb), F.lit(0)).cast("bigint").alias("__off__"),
        )
    )
    win = (
        Window.partitionBy("__bucket__")
        .orderBy("__key__", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.col("__off__") + F.coalesce(F.sum("__sz__").over(win), F.lit(0))
    return (
        b.join(F.broadcast(offsets), "__bucket__")
        .withColumn("cum_before", cum.cast("bigint"))
        .select(
            id_col,
            F.col("__sz__").alias("doc_bytes"),
            "cum_before",
            F.expr(f"CAST(cum_before DIV {int(budget)} AS BIGINT)").alias("shard"),
            F.expr(f"CAST(cum_before % {int(budget)} AS BIGINT)").alias(
                "offset_in_shard"
            ),
        )
    )
