"""Scale techniques as first-class operators: key salting for skew
joins, bucketed co-located joins.

These address the two shuffle pathologies a 100 TB deployment hits
(SURVEY.md §4 / pyspark guide "Partitioning & shuffle"):

- **Skew**: one hot key makes one reducer process most of the data.
  AQE's skew-join splitting handles *sort-merge* skew at runtime;
  salting is the explicit fallback for aggregations and for joins AQE
  can't split (e.g. when the skewed side must broadcast-expand).
- **Repeated shuffles on a stable key**: fact tables joined on the
  same key every run should be bucketed once at write time; a join of
  two tables bucketed on the key with the same bucket count needs NO
  exchange at read time — at 100 TB this converts the dominant
  shuffle into a free co-located merge.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
    salt_cols: list[str] | None = None,
    strategy: str | None = None,
) -> DataFrame:
    """Skew-proof equi-join: the skewed side gets a random-ish salt
    derived from a stable row hash (deterministic, unlike rand() —
    replays identically); the small side is exploded ×salt_buckets so
    every (key, salt) pair finds its match.

    Shuffle keys become (key, salt): the hot key's rows spread over
    ``salt_buckets`` reducers. The small side grows by the factor —
    use only when `small` is genuinely small.

    ``strategy`` defaults to ``None`` (planner choice — ADVICE round
    10: a forced shuffled-hash default would silently remove the
    spill path from every existing call site, and a larger 'small'
    side that previously sort-merged could OOM a build partition).
    For the mid-size case where broadcast is too big but skew still
    bites, pass ``strategy="shuffle_hash"`` explicitly: left to its
    own estimates the planner tends to broadcast the exploded side,
    which both defeats the point (a broadcast join never shuffles the
    skewed side — the salt is pure ×salt_buckets overhead) and
    serializes the whole ×salt_buckets build through the driver —
    measured ~3× slower at sf0.1 (round 10). ``strategy="merge"`` is
    the spill-safe sort-merge variant. Join strategy never changes
    the result (config-parity sweeps pin this).

    ``salt_cols`` names the columns hashed for the salt. Default is ALL
    of ``skewed``'s columns — always deterministic, but it blocks scan
    column pruning (every column becomes referenced): on a wide fact
    table pass the few columns that vary within a key so the scan stays
    pruned to what the query needs.
    """
    if how in ("right", "rightouter", "right_outer", "full", "fullouter", "full_outer", "outer"):
        # exploding the small side x salt_buckets would emit each
        # unmatched right row salt_buckets times under these join types
        raise ValueError(f"salted_join does not support how={how!r}; use inner/left/semi/anti")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in (salt_cols or skewed.columns)]), F.lit(salt_buckets)
    )
    left = skewed.withColumn("__salt__", salt.cast("int"))
    right = small.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    if strategy:
        right = right.hint(strategy)
    out = left.join(right, [key, "__salt__"], how)
    return out.drop("__salt__")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: list[str],
    num_buckets: int = 8,
    sort_by: list[str] | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by the join
    key. Requires a session with a warehouse dir + Hive-less catalog
    (default local works). Reading it back joins co-located."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *keys)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table_name)


def bucketed_join_ready(spark: SparkSession, a: str, b: str) -> DataFrame:
    """Read two bucketed tables for a co-located join (no exchange on
    either side when bucket specs match)."""
    return spark.table(a), spark.table(b)  # type: ignore[return-value]


def cluster_by_range(df: DataFrame, cols: list[str], num_files: int = 8) -> DataFrame:
    """Range-cluster rows so each output file's parquet footer carries
    a NARROW, mostly-disjoint min/max range on ``cols`` — the data
    layout that makes selective filters skip whole row groups/files at
    scan time (the open-table-format "OPTIMIZE ZORDER/cluster by"
    effect, for the single-dimension case, with nothing but Spark
    built-ins).

    One range exchange (Spark samples the columns to build balanced
    range bounds) + an in-partition sort; write the result with
    ``.write.parquet``. At 100 TB this is the difference between a
    timestamp-predicate scan touching every file and touching the few
    files whose range overlaps — row groups elsewhere are skipped from
    footer stats alone, before any column data is read. For multi-
    column locality use an interleaved key or a space-filling curve;
    range clustering on the dominant filter column is the 80% win.
    """
    return df.repartitionByRange(num_files, *[F.col(c) for c in cols]).sortWithinPartitions(
        *cols
    )


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of two ``bits``-bit quantized long
    columns: bit i of x lands at position 2i, bit i of y at 2i+1. Rows
    close in BOTH dimensions get close z-values, so range-clustering on
    z gives every output file a narrow min/max envelope on BOTH columns
    — the multi-dimensional data-skipping layout (Delta/Iceberg
    OPTIMIZE ZORDER effect) from nothing but shift/and arithmetic.

    Pure integer expression — identical bit-for-bit in any engine; the
    32 single-bit terms occupy disjoint positions so `+` is `|`.

    (Column-operator form, kept for arbitrary Column inputs; the
    production path `with_zorder_key` uses the parsed-SQL twin
    `_zorder_sql` over named projections — one parser call instead of
    ~200 py4j round trips, round 11 cProfile.)
    """
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def _zorder_sql(xcol: str, ycol: str, bits: int) -> str:
    """Parsed-SQL twin of :func:`zorder_key` over two named LONG
    columns — identical expression tree (shiftleft/shiftright/&/+),
    built by the SQL parser in one call instead of 12·bits py4j
    round trips (the kmeans `_sqdist_sql` rationale; round 11 cProfile
    showed plan CONSTRUCTION, not execution, dominating
    zorder_cluster's driver gap)."""
    return " + ".join(
        f"shiftleft(shiftright({xcol}, {i}) & 1, {2 * i})"
        f" + shiftleft(shiftright({ycol}, {i}) & 1, {2 * i + 1})"
        for i in range(bits)
    )


def quantize_col(v: Column, vmin: Column, vmax: Column, bits: int = 16) -> Column:
    """Proportional quantization of a long column to [0, 2^bits):
    floor((v - min)·(2^bits − 1) / (max − min)). The double division is
    IEEE-identical across engines (same operands, same rounding), so
    floor agrees bit-for-bit. A constant column (max == min) quantizes
    to 0 — guarded explicitly, because bare x/0.0 is NaN in Spark but
    NULL in DuckDB and would silently break the cross-engine contract.
    SQL twin: CASE WHEN vmax > vmin THEN CAST(floor((v - vmin) * m
    / CAST(vmax - vmin AS DOUBLE)) AS BIGINT) ELSE 0 END."""
    span = (vmax - vmin).cast("double")
    q = F.floor((v - vmin).cast("long") * F.lit((1 << bits) - 1) / span).cast("long")
    return F.when(vmax > vmin, q).otherwise(F.lit(0).cast("long"))


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16, out: str = "__z"
) -> DataFrame:
    """Append the Morton key for two long columns: one-row global
    min/max stats broadcast back (the table itself never shuffles),
    quantize each column, interleave. Shared by the clustered-write
    path (`cluster_by_zorder`) and the bucket-locality qid
    (`zorder_cluster`), so the quantization convention cannot drift
    between them."""
    assert len(cols) == 2, "zorder interleaves exactly two columns"
    cx, cy = cols
    stats = df.agg(
        F.min(cx).alias("__minx"), F.max(cx).alias("__maxx"),
        F.min(cy).alias("__miny"), F.max(cy).alias("__maxy"),
    )
    j = df.crossJoin(F.broadcast(stats))
    # quantize into named projections, then ONE parsed interleave
    # expression over them (same tree as zorder_key; _zorder_sql note)
    j = j.withColumns(
        {
            "__zqx": quantize_col(F.col(cx), F.col("__minx"), F.col("__maxx"), bits),
            "__zqy": quantize_col(F.col(cy), F.col("__miny"), F.col("__maxy"), bits),
        }
    )
    return j.withColumn(out, F.expr(_zorder_sql("__zqx", "__zqy", bits))).drop(
        "__minx", "__maxx", "__miny", "__maxy", "__zqx", "__zqy"
    )


def cluster_by_zorder(
    df: DataFrame, cols: list[str], num_files: int = 16, bits: int = 16
) -> DataFrame:
    """Two-column Z-order clustering: Morton key via
    ``with_zorder_key``, then range-partition + sort on it. Each output
    file's parquet footer then carries a narrow min/max on BOTH
    columns, so a conjunctive two-column predicate skips all but a few
    files — where single-column range clustering only narrows one of
    them.
    """
    out = with_zorder_key(df, cols, bits)
    return (
        out.repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def skew_profile(df: DataFrame, key: str) -> DataFrame:
    """Per-key distribution diagnostics — the pre-flight check before
    choosing a join/agg strategy at scale (broadcast? salt? AQE skew
    split?). One shuffle to count rows per key (map-side combine), then
    a scalar aggregate over the (much smaller) counts table.

    Output (one row): n_keys, n_rows, max_per_key, avg_per_key,
    p50_per_key, p99_per_key, skew_ratio (max/avg). The exact
    percentile runs over |keys| rows, not |rows|; when even the key
    table is huge, swap in approx_percentile (see `approx_quantiles`).
    """
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import pround

    counts = df.groupBy(key).agg(F.count("*").alias("n"))
    return counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_per_key"),
        pround(F.avg("n"), 6).alias("avg_per_key"),
        pround(F.expr("percentile(n, 0.5)"), 6).alias("p50_per_key"),
        pround(F.expr("percentile(n, 0.99)"), 6).alias("p99_per_key"),
        pround(F.max("n") / F.avg("n"), 6).alias("skew_ratio"),
    )


def bloom_semi_join(
    big: DataFrame,
    keys: DataFrame,
    big_key: str,
    keys_key: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
) -> DataFrame:
    """Exact semi-join of ``big`` against ``keys``, pre-filtered by a
    Bloom filter built from the key side.

    At 100 TB the point of a Bloom/runtime filter is to discard probe
    rows BEFORE the join shuffle: the filter is a tiny bitmap (m_bits
    bits -> m_bits/64 longs, 8 KiB at the default) that ships to every
    scan task as a literal, so the expensive exchange only carries rows
    that might match. Spark's own runtime filters
    (spark.sql.optimizer.runtime.bloomFilter.enabled) do this
    automatically for some shapes; this operator is the explicit,
    inspectable version, and it composes with any downstream op.

    The bitmap is built distributed (bit_or aggregation over word
    index — one shuffle of |keys| rows into m_bits/64 groups), then
    collected: the collect is O(m_bits/64) words, NOT O(|keys|). The
    final left-semi join removes Bloom false positives, so the result
    is exactly ``big SEMI JOIN keys`` — the filter only changes the
    plan, never the answer.
    """
    filtered = bloom_prefilter(big, keys, big_key, keys_key, m_bits, k_hashes)
    return filtered.join(
        F.broadcast(keys.select(F.col(keys_key).alias(big_key)).distinct()),
        on=big_key,
        how="left_semi",
    )


def _fold_bitmap(bitmap: list[int], m: int, min_bits: int = 4096,
                 density_factor: int = 32) -> tuple[list[int], int]:
    """Shrink a power-of-two Bloom bitmap to the smallest power of two
    that keeps the set-bit DENSITY under 1/``density_factor`` — sizing
    the probe-side literal to the keys actually present instead of the
    build-time worst case.

    Correct because the probe position is ``h mod m`` and every
    candidate size divides the build size: ``h mod m' =
    (h mod m) mod m'``, so OR-ing the 2^j aliased word blocks together
    preserves every set bit (no false negatives) while the density
    bound keeps fpr ≤ (1/density_factor)^k ≈ 3e-5 at k=3 (k=1 callers
    get ~1/density_factor ≈ 3% — size density_factor to the k in use).
    Motivation
    (round 10): a fixed 2^16-bit bitmap is a 1024-element array literal
    — CreateArray with 1024 children costs ~0.9 s of py4j construction
    plus analyzer/optimizer walks per run (measured: bloom_join spent
    ~3 s/run of driver time outside any job); the folded 64-word
    literal removes that without touching the answer (the exact
    semi-join stays).
    """
    s = sum(bin(w & 0xFFFFFFFFFFFFFFFF).count("1") for w in bitmap)
    target = min_bits
    while target < density_factor * s and target < m:
        target *= 2
    if target >= m or m % target != 0:
        return bitmap, m
    tw = target // 64
    folded = [0] * tw
    for i, w in enumerate(bitmap):
        folded[i % tw] |= w
    return folded, target


def bloom_prefilter(
    big: DataFrame,
    keys: DataFrame,
    big_key: str,
    keys_key: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
) -> DataFrame:
    """The probabilistic half of :func:`bloom_semi_join`: rows of
    ``big`` that PASS the Bloom bitmap built from ``keys`` — every
    true match plus a bounded false-positive residue
    (fpr ≈ (1 − e^(−k·n/m))^k). Exposed separately so callers can
    audit the filter (see the ``bloom_fpr_audit`` qid) or place the
    exact verification elsewhere in the plan.

    ``m_bits`` is the BUILD modulus; after the one-pass distributed
    build the collected bitmap is folded down (:func:`_fold_bitmap`) to
    the smallest power of two whose set-bit density stays under 1/32,
    so sparse key sets ship a few dozen literal words instead of 1024
    while dense ones keep the full size. Folding never drops a set
    bit, so there are still no false negatives.
    """
    m = int(m_bits)
    words = (m + 63) // 64  # ceil: positions span [0, m), even when m % 64 != 0

    # Canonical-string hashing is only sound when both sides stringify
    # the SAME value identically. All integral types do ("5" == "5"
    # for int and bigint), but bigint-vs-double would hash '5' against
    # '5.0' — every true match fails the bitmap and the filter
    # silently returns ~nothing, even though the equality join itself
    # would have coerced 5 == 5.0. Fail fast and make the caller cast
    # one side explicitly.
    # Scale-0 decimals stringify without a fractional part ("5", not
    # "5.0"), so decimal(p,0) keys hash identically to int/bigint keys
    # — the guard treats them as the same family rather than raising
    # on a pair whose canonical strings actually agree.
    integral = {"tinyint", "smallint", "int", "bigint"}
    bt = dict(big.dtypes)[big_key]
    kt = dict(keys.dtypes)[keys_key]

    def fam(t: str) -> str:
        if t in integral or re.fullmatch(r"decimal\(\d+,0\)", t):
            return "integral"
        return t

    if fam(bt) != fam(kt):
        raise ValueError(
            f"bloom_prefilter key types disagree ({big_key}: {bt} vs "
            f"{keys_key}: {kt}): their canonical string forms differ, so "
            "every true match would fail the bitmap — cast one side first"
        )

    def positions(col: Column, modulus: int) -> list[Column]:
        # xxhash64 is type-width sensitive (hash(5 as int) != hash(5 as
        # long)), so both sides MUST hash one canonical type or every
        # true match silently fails the bitmap test. The canonical form
        # is STRING, not long: a long cast of a non-numeric string key
        # yields NULL, collapsing all k positions to seed constants so
        # every probe row passes — the filter silently becomes a no-op
        # and the documented FPR bound is violated. String round-trips
        # every key type losslessly ("5" == "5" whether int or long).
        c = col.cast("string")
        return [
            F.pmod(F.xxhash64(c, F.lit(seed)), F.lit(modulus))
            for seed in range(k_hashes)
        ]

    key_col = F.col(keys_key)
    pos = keys.select(
        F.explode(F.array(*positions(key_col, m))).alias("pos")
    )
    word_rows = (
        pos.withColumn("w", (F.col("pos") / 64).cast("int"))
        .withColumn("bit", F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"))
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    bitmap = [0] * words
    for r in word_rows:
        bitmap[r["w"]] = r["word"]
    bitmap, m = _fold_bitmap(bitmap, m)
    lit_bitmap = F.array(*[F.lit(w).cast("long") for w in bitmap])

    probed = big.withColumn("_bloom_words", lit_bitmap)
    checks = []
    for seed, h in enumerate(positions(F.col(big_key), m)):
        hname = f"_bloom_h{seed}"
        probed = probed.withColumn(hname, h)
        checks.append(
            f"(shiftright(element_at(_bloom_words, CAST({hname} DIV 64 AS INT) + 1), "
            f"CAST({hname} % 64 AS INT)) & 1) = 1"
        )
    return probed.where(F.expr(" AND ".join(checks))).drop(
        "_bloom_words", *[f"_bloom_h{s}" for s in range(k_hashes)]
    )


def join_size_exact(a: DataFrame, b: DataFrame, a_key: str, b_key: str) -> DataFrame:
    """Exact equi-join output cardinality WITHOUT running the join:
    Σ over keys of cntA(k)·cntB(k). Two map-side-combinable groupBys
    plus a join on the (much smaller) key-count tables — at 100 TB
    this is how you cost a join before choosing its strategy, not by
    executing it. One row: (join_size)."""
    ca = a.groupBy(F.col(a_key).alias("k")).agg(F.count(F.lit(1)).alias("ca"))
    cb = b.groupBy(F.col(b_key).alias("k")).agg(F.count(F.lit(1)).alias("cb"))
    return ca.join(cb, "k").agg(
        F.sum(F.col("ca") * F.col("cb")).cast("long").alias("join_size")
    )


# count tables persisted by join_size_sampled outlive the call (the
# returned plan references them); they are tracked in the shared
# lock-guarded cache registry under the group below (ADVICE r9: the
# old module-global list was unsynchronized and let concurrent callers
# release each other's caches — the registry's per-call handles and
# named group close both).
_ESTIMATOR_GROUP = "join_size_estimator"


def release_estimator_caches() -> int:
    """Unpersist every count table cached by prior
    ``join_size_sampled`` calls; returns how many were released.
    Safe to call while other plans are running — an unpersisted table
    recomputes on next reference. Delegates to the shared registry, so
    it only sweeps THIS group (a concurrent composition qid's stage
    persists are untouched)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators import cache_registry

    return cache_registry.release_group(_ESTIMATOR_GROUP)


def join_size_sampled(
    a: DataFrame,
    b: DataFrame,
    a_key: str,
    b_key: str,
    rate_inv: int = 16,
    heavy_denom: int = 256,
) -> DataFrame:
    """END-BIASED sampled estimate of the same quantity: heavy keys
    contribute EXACTLY, only the light tail is sampled. Plain
    key-sampling is worthless under skew — a key holding half the
    table is either in the sample (estimate ~rate_inv²× its true
    share) or out (estimate misses half the join), so the estimate's
    error is unbounded no matter the rate; the skew fuzz profile at
    the sf0.01 base caught exactly that (round 8 — at the sf0.001
    base the size-adaptive rate was 1 and the gate was vacuous).

    Shape (all bounded, no full count-table join):
    1. per-side key counts (map-side-combinable groupBys — the same
       stats pass a planner runs; what this sketch AVOIDS is joining
       the two full count tables on a huge key domain);
    2. heavy set H = keys with count > n/heavy_denom on EITHER side —
       ≤ heavy_denom rows per side by construction, broadcast;
    3. exact part: Σ ca·cb over H (two broadcast semi-joins of the
       count tables against H, then a ≤|H|-row join);
    4. light part: H anti-joined away, keys gated at 1/rate_inv with
       INDEPENDENT xxhash64 seeds (correlated gates would bias a
       self-join), Σ ca·cb scaled by rate_inv². Light keys have
       per-key contribution < (n_a·n_b)/heavy_denom², so the sampled
       sum concentrates — the variance the heavy keys used to blow up
       is gone by construction.

    With no heavy keys the estimate is BIT-IDENTICAL to plain
    key-sampling (same gates, same scaling), so unskewed estimates are
    unchanged. Deterministic end to end (hash gates, no rand()). One
    row: (est_size).

    The two count tables are persisted (MEMORY_AND_DISK): the estimate
    references each 4× (total, heavy filter, exact part, light tail)
    and Catalyst does not dedupe common subplans — unpersisted, each
    reference re-scans the fact side (the curation_release lesson,
    docs/ROUND8_NOTES.md §3). LRU-evictable; eviction degrades to
    recompute. Because the RETURNED plan still references the caches,
    they cannot be released before the caller's action runs; each call
    tracks them in the shared lock-guarded cache registry instead —
    the call keeps a scoped handle, and long-lived sessions call
    ``release_estimator_caches()`` after collecting the estimate
    (ADVICE r8/r9: per-call persists otherwise accumulate for the
    session lifetime, and the old bare list was unsynchronized)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators import cache_registry

    ca = cache_registry.persist_tracked(
        a.groupBy(F.col(a_key).alias("k")).agg(F.count(F.lit(1)).alias("ca")),
        _ESTIMATOR_GROUP,
    )
    cb = cache_registry.persist_tracked(
        b.groupBy(F.col(b_key).alias("k")).agg(F.count(F.lit(1)).alias("cb")),
        _ESTIMATOR_GROUP,
    )
    na = ca.agg(F.sum("ca").alias("na"))
    nb = cb.agg(F.sum("cb").alias("nb"))
    ha = (
        ca.crossJoin(F.broadcast(na))
        .filter(F.col("ca") * heavy_denom > F.col("na"))
        .select("k")
    )
    hb = (
        cb.crossJoin(F.broadcast(nb))
        .filter(F.col("cb") * heavy_denom > F.col("nb"))
        .select("k")
    )
    heavy = ha.unionByName(hb).distinct()  # <= 2*heavy_denom rows
    heavy_part = (
        ca.join(F.broadcast(heavy), "k")
        .join(cb.join(F.broadcast(heavy), "k"), "k")
        .agg(F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0)).alias("heavy_size"))
    )
    # hash the key as-is: xxhash64 takes any type, and casting (e.g. a
    # string key to long) would hash NULL for every row, collapsing the
    # gate to all-or-nothing
    la = ca.join(F.broadcast(heavy), "k", "left_anti").where(
        F.pmod(F.xxhash64(F.col("k"), F.lit(11)), F.lit(rate_inv)) == 0
    )
    lb = cb.join(F.broadcast(heavy), "k", "left_anti").where(
        F.pmod(F.xxhash64(F.col("k"), F.lit(23)), F.lit(rate_inv)) == 0
    )
    light_part = la.join(lb, "k").agg(
        (
            F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0))
            * F.lit(rate_inv * rate_inv)
        ).alias("light_size")
    )
    return heavy_part.crossJoin(light_part).select(
        (F.col("heavy_size") + F.col("light_size")).cast("long").alias("est_size")
    )


def grouped_topk_salted(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
    id_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe per-group top-k: the two-phase decomposition of
    ``row_number() <= k`` for PATHOLOGICALLY hot groups. A single
    rank-k window keyed by the group concentrates every row of a hot
    group on one task before discarding all but k — at 100 TB a
    boilerplate-dominated group (one language, one domain) turns that
    task into the straggler. Top-k is decomposable, so:

    1. phase 1 ranks within (group, salt) — ``n_salts`` deterministic
       md5 sub-partitions — keeping k rows per salt; the hot group's
       rows spread over ``n_salts`` tasks and each emits at most k;
    2. phase 2 ranks the ≤ k·n_salts survivors per group — a window
       over a provably bounded input (the bound every global-window
       whitelist entry in this repo states).

    Both phases compile to WindowGroupLimit (partial top-k per
    partition BEFORE each shuffle — pinned by the plan gate), so even
    phase 1's shuffle moves at most k rows per (salt, partition). The
    salt is md5-deterministic (``sampling.hash_bucket_col`` idiom), so
    reruns and the SQL twin see identical sub-partitions — though the
    RESULT is salt-invariant by construction, which the unit test
    property-checks across n_salts ∈ {1, 3, 16}.

    Ordering: ``order_col`` DESC, ties broken by ``id_col`` ASC —
    total, so the top-k set and ranks are unique and exactly equal to
    the direct single-window form (the oracle twin).

    Output: input columns + ``group_rank`` (1..k, 1 = best in group).
    """
    if k <= 0 or n_salts <= 0:
        raise ValueError("k and n_salts must be positive")
    from oracle_to_oracle_data_integration_pipeline_spark.operators.sampling import hash_bucket_col

    salt = hash_bucket_col(F.col(id_col), n_salts)
    w1 = Window.partitionBy(group_col, "__salt__").orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    survivors = (
        df.withColumn("__salt__", salt)
        .withColumn("__r1__", F.row_number().over(w1))
        .filter(F.col("__r1__") <= k)
    )
    w2 = Window.partitionBy(group_col).orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    return (
        survivors.withColumn("group_rank", F.row_number().over(w2).cast("int"))
        .filter(F.col("group_rank") <= k)
        .drop("__salt__", "__r1__")
    )


def signed_log_bucket(v: Column, k: int = 100) -> Column:
    """``sign(v)·floor(log10(|v|+1)·k)`` — a monotonic non-decreasing
    bucket of ``v`` that is TOTAL over every real (0 and negatives
    included), for :func:`distributed_rank` over skewed measures.
    Bare ``floor(log10(v)·k)`` is NULL at v ≤ 0 (Spark's non-ANSI log
    of a non-positive), and a NULL bucket silently drops the row in
    the rank's offsets join; |v|+1 keeps the log argument ≥ 1, and the
    sign flip keeps negatives ordered below positives. NULL in → NULL
    out (callers exclude NULL sort values by contract)."""
    return F.signum(v) * F.floor(F.log10(F.abs(v) + F.lit(1.0)) * F.lit(float(k)))


def distributed_rank(
    df: DataFrame,
    order_col: str,
    id_col: str,
    bucket: Column,
    out_col: str = "value_rank",
    max_buckets: int = 65536,
) -> DataFrame:
    """Exact global rank BY VALUE without a global window — the
    value-ordered sibling of ``curation.global_order_index`` (which
    ranks by a hashed permutation). Semantically identical to
    ``row_number() OVER (ORDER BY order_col, id_col)`` but distributed:

    1. ``bucket`` maps each row to a driver-scale cell; it MUST be a
       monotonic non-decreasing function of ``order_col`` (equal
       values land in one bucket, larger values never in a smaller
       bucket) — that is the correctness condition, exactly as the
       monotonic md5-prefix split is for global_order_index. Typical
       choices: the value itself for bounded ints (days, counts),
       ``floor(log10(v)·K)`` for positive skewed doubles.
    2. per-bucket counts prefix-sum into offsets — a window over
       ≤``max_buckets`` histogram rows (driver scale, the stated
       bound);
    3. rows rank within their bucket in parallel (window keyed by
       bucket, ordered by (order_col, id_col)) and add the broadcast
       offset.

    Because the bucket is monotonic in the sort value and the
    within-bucket order is total, offset + local rank IS the global
    row_number — at any bucket count. Used by ``gini_concentration``
    and ``rfm_segments`` instead of the single-partition global sort
    a naive rank would plan at 100 TB.

    NULL contract: the offsets equi-join drops any row whose bucket
    evaluates to NULL — a NULL ``order_col`` (or a partial bucket
    like ``log10(v)`` at v ≤ 0) silently vanishes from the output
    rather than ranking. Callers MUST exclude NULL sort values as an
    explicit stated contract (their oracles too — Spark and DuckDB
    also disagree on NULL rank order, DIVERGENCES.md class 8) and
    pass a bucket that is total over every non-NULL value (e.g. the
    signed ``sign(v)·floor(log10(|v|+1)·K)`` bucket, monotonic over
    all reals including 0 and negatives, rather than bare
    ``floor(log10(v)·K)``). Found by the sf0.1 nulls fuzz sweep,
    round 10: customers whose every order carried a NULL price were
    dropped instead of excluded-by-contract.

    Output: input columns + (out_col BIGINT) in [1, N].
    """
    b = df.withColumn("__bucket__", bucket.cast("bigint"))
    # (callers are responsible for excluding NULL sort values first —
    # see the NULL contract above; nothing here can rank what the
    # engines order oppositely)
    wb = Window.orderBy("__bucket__").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        b.groupBy("__bucket__")
        .agg(F.count(F.lit(1)).alias("__n__"))
        .select(
            "__bucket__",
            F.coalesce(F.sum("__n__").over(wb), F.lit(0))
            .cast("bigint")
            .alias("__off__"),
        )
    )
    win = Window.partitionBy("__bucket__").orderBy(order_col, id_col)
    return (
        b.join(F.broadcast(offsets), "__bucket__")
        .withColumn(out_col, (F.col("__off__") + F.row_number().over(win)).cast("bigint"))
        .drop("__bucket__", "__off__")
    )
