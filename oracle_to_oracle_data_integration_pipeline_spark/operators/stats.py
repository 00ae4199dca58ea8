"""Statistical analytics operators: rolling medians, per-key OLS
regression, MAD outlier detection, chi-square independence, item
co-occurrence — the classic "is this corpus healthy / what correlates
with what" toolkit a training-data pipeline runs after curation.

All pure DataFrame algebra (no Python in the hot path). Determinism
conventions follow queries/_util.py: per-term portable rounding +
decimal sums wherever double summation order could differ between a
32-thread local run and a 1000-executor tree aggregation.

Scale notes per operator are in the docstrings; none of these sort the
full corpus and the only self-join (co-occurrence) is bounded by the
per-group degree, not the table size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.text import ascii_lower_col
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import dsum, pround


def rolling_median(
    df: DataFrame,
    key: str,
    order: list[str],
    value: str,
    n: int = 5,
) -> DataFrame:
    """Trailing-``n``-row median of ``value`` per ``key``.

    Spark has no exact-median window function, so we carry the trailing
    frame as a sorted array (``collect_list`` over a ROWS frame, then
    ``array_sort``) and index its middle. The frame is at most ``n``
    elements, so per-row state is O(n) regardless of corpus size — at
    100 TB this is one shuffle on ``key`` (the window partitioning) and
    nothing else. Even-length frames interpolate (mean of the two
    middle values), matching DuckDB/ANSI ``median``.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(-(n - 1), 0)
    )
    frame = F.array_sort(F.collect_list(F.col(value).cast("double")).over(w))
    med = F.expr(
        "CASE WHEN size(_frame) % 2 = 1 THEN _frame[size(_frame) DIV 2] "
        "ELSE (_frame[size(_frame) DIV 2 - 1] + _frame[size(_frame) DIV 2]) / 2.0 END"
    )
    return (
        df.withColumn("_frame", frame)
        .withColumn("rolling_median", pround(med, 6))
        .drop("_frame")
    )


def ols_per_key(
    df: DataFrame,
    key: str,
    x: Column,
    y: Column,
    min_points: int = 2,
) -> DataFrame:
    """Per-key ordinary-least-squares fit ``y = slope·x + intercept``.

    Closed-form from five sufficient statistics, so the whole fit is
    one map-side-combinable aggregation — the canonical "don't collect
    the points, aggregate the moments" scale shape. ``x`` is re-based
    to the per-key minimum first (one extra agg + a join the planner
    sizes itself — the x0 table has one row PER KEY, so it grows with
    key cardinality and must not be hint-pinned to broadcast; r7
    tools/broadcast_audit.py find) so x² sums stay small enough for
    exact DECIMAL accumulation;
    without the re-base, epoch-seconds² sums exceed 2^53 and the
    partial-agg tree order would leak into the result bits.

    x must be integral after re-basing (day index, step count, ...);
    y is rounded per-term to 6dp before the exact decimal sum.
    """
    base = df.select(F.col(key).alias("k"), x.alias("x"), y.cast("double").alias("y"))
    x0 = base.groupBy("k").agg(F.min("x").alias("x0"))
    j = base.join(x0, "k").withColumn("dx", F.col("x") - F.col("x0"))
    agg = j.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(24,6)")).cast("double").alias("sy"),
        dsum(pround(F.col("dx") * F.col("y"), 6), 6).alias("sxy"),
    )
    denom = agg["n"] * agg["sxx"] - agg["sx"] * agg["sx"]
    slope = pround(
        (agg["n"] * agg["sxy"] - agg["sx"] * agg["sy"]) / denom.cast("double"), 6
    )
    # intercept from the already-rounded slope: deterministic scalar math
    return agg.where((F.col("n") >= min_points) & (denom != 0)).select(
        F.col("k").alias(key),
        "n",
        slope.alias("slope"),
        pround(
            (agg["sy"] - slope * agg["sx"].cast("double")) / agg["n"].cast("double"), 6
        ).alias("intercept"),
    )


def mad_outlier_summary(
    df: DataFrame,
    key: str,
    value: str,
    k_mad: float = 3.0,
) -> DataFrame:
    """Per-group (n, median, MAD, outlier count where |v−med| > k·MAD)
    — the robust DQ screen that survives heavy tails.

    Two exact-percentile aggregations (median of v, then median of
    |v−med|) with the tiny per-group medians broadcast back onto the
    fact, so the corpus shuffles exactly twice and never sorts
    globally. ``percentile`` is Spark's exact aggregate; at 100 TB
    swap in ``percentile_approx`` (same plan shape, documented
    accuracy/cost dial).
    """
    v = F.col(value).cast("double")
    med = df.groupBy(key).agg(
        pround(F.expr(f"percentile(CAST({value} AS DOUBLE), 0.5)"), 6).alias("med")
    )
    dev = df.join(F.broadcast(med), key).withColumn("dev", F.abs(v - F.col("med")))
    mad = dev.groupBy(key, "med").agg(
        pround(F.expr("percentile(dev, 0.5)"), 6).alias("mad")
    )
    flagged = dev.join(F.broadcast(mad.select(key, "mad")), key)
    return (
        flagged.groupBy(key, "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("dev") > F.lit(k_mad) * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .select(key, "n", "med", "mad", "n_outliers")
    )


def chi2_independence(
    df: DataFrame,
    row_key: str,
    col_key: str,
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns. One groupBy over the corpus produces the contingency
    table; everything after runs on that tiny table (|rows|·|cols|
    cells) with window totals — no second pass over the data. Cells
    the corpus never exhibits still carry (0−e)²/e = e, so the
    observed table is completed to the full category cross product
    (tiny × tiny cross join) before the statistic. Returns one row:
    (n, dof, chi2).

    Only COMPLETE pairs participate (the spearman_corr guard): a NULL
    category would form its own observed group yet fail the equality
    join when completing the cross product, yielding an r_tot=0 row
    and a 0/0 expected count — so NULL rows in either column are
    dropped up front.
    """
    df = df.where(F.col(row_key).isNotNull() & F.col(col_key).isNotNull())
    observed = df.groupBy(row_key, col_key).agg(F.count(F.lit(1)).alias("o"))
    cells = (
        observed.select(row_key)
        .distinct()
        .crossJoin(observed.select(col_key).distinct())
        .join(observed, [row_key, col_key], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
    )
    w_row = Window.partitionBy(row_key)
    w_col = Window.partitionBy(col_key)
    w_all = Window.partitionBy()
    with_tot = (
        cells.withColumn("r_tot", F.sum("o").over(w_row))
        .withColumn("c_tot", F.sum("o").over(w_col))
        .withColumn("n_tot", F.sum("o").over(w_all))
    )
    e = (
        F.col("r_tot").cast("double")
        * F.col("c_tot").cast("double")
        / F.col("n_tot").cast("double")
    )
    term = pround((F.col("o").cast("double") - e) * (F.col("o") - e) / e, 6)
    return with_tot.select(
        F.col("n_tot").alias("n"),
        F.size(F.collect_set(row_key).over(w_all)).alias("_r"),
        F.size(F.collect_set(col_key).over(w_all)).alias("_c"),
        term.alias("_term"),
    ).groupBy("n").agg(
        ((F.first("_r") - 1) * (F.first("_c") - 1)).alias("dof"),
        dsum(F.col("_term"), 6).alias("chi2"),
    )


def cooccurrence_pairs(
    df: DataFrame,
    group: str,
    item: str,
    top_k: int = 20,
) -> DataFrame:
    """Top-k co-occurring item pairs within a group (market-basket
    style: parts bought together in one order, tokens sharing a doc).

    The self-join is keyed on ``group`` after per-group item dedup, so
    its cost is Σ(degree²) over groups — bounded by the max basket
    size (≤7 lineitems per TPC-H order), NOT corpus². The final top-k
    is `ORDER BY ... LIMIT k` → TakeOrderedAndProject, no global sort.
    """
    items = df.select(F.col(group).alias("g"), F.col(item).alias("i")).distinct()
    a = items.alias("a")
    b = items.alias("b")
    pairs = a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.i") < F.col("b.i")))
    return (
        pairs.groupBy(F.col("a.i").alias("item_a"), F.col("b.i").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .orderBy(F.desc("n_groups"), "item_a", "item_b")
        .limit(top_k)
    )


def bigram_topk(df: DataFrame, text: str = "text", top_k: int = 20) -> DataFrame:
    """Top-k word bigrams over the corpus — the LM-training co-location
    statistic. Bigram construction is a pure higher-order-function zip
    of the token array against itself shifted by one (map-side, no
    shuffle); only the (bigram → count) aggregation shuffles, keyed on
    the bigram itself.
    """
    # ASCII fold, not lower(): token strings are GROUP KEYS here, and
    # full-vs-simple Unicode case mapping diverges between the engines
    # (fuzz find, unicode profile — see operators/text.ascii_lower_col)
    toks = F.split(ascii_lower_col(F.col(text)), " ")
    bigrams = F.expr(
        "zip_with(slice(_toks, 1, size(_toks) - 1), "
        "slice(_toks, 2, size(_toks) - 1), (a, b) -> concat(a, ' ', b))"
    )
    return (
        df.withColumn("_toks", toks)
        .where(F.size("_toks") >= 2)
        .withColumn("bigram", F.explode(bigrams))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(top_k)
    )


def char_entropy(df: DataFrame, id_col: str, text: str = "text") -> DataFrame:
    """Per-document Shannon entropy (nats) of the character
    distribution — a strong gibberish/boilerplate signal (low entropy =
    repeated filler, high = random noise).

    Characters explode map-side; the only shuffle is the
    (doc, char) → count aggregation, keyed by doc so the per-doc
    entropy reduction is co-located — the document length rides along
    as a group key (it is just ``length(text)``), so no second
    window/exchange is needed for the total. Empty documents are
    dropped (their entropy is undefined; ``sequence(1, 0)`` would
    otherwise enumerate DESCENDING and fabricate phantom characters).
    Per-term ``p·ln p`` is rounded portably then summed exactly
    (decimal), keeping the result bit-identical between a local run
    and a 1000-way partial-agg tree.
    """
    chars = F.expr(f"transform(sequence(1, length({text})), i -> substring({text}, i, 1))")
    counts = (
        df.where(F.length(F.col(text)) > 0)
        .select(F.col(id_col), F.length(F.col(text)).cast("long").alias("n_chars"), F.explode(chars).alias("ch"))
        .groupBy(id_col, "n_chars", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    p = F.col("c").cast("double") / F.col("n_chars").cast("double")
    term = pround(-p * F.log(p), 6)
    return (
        counts.select(id_col, "n_chars", term.alias("_term"))
        .groupBy(id_col, "n_chars")
        .agg(dsum(F.col("_term"), 6).alias("entropy"))
    )


def histogram_fixed(
    df: DataFrame,
    key: str,
    value: str,
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """Fixed-width histogram of ``value`` per ``key`` over [lo, hi):
    bin assignment is map-only column algebra (no sort, no percentile),
    so the whole operator is one map-side-combinable groupBy — the
    cheapest possible distribution profile at any scale. Out-of-range
    rows are dropped (count them upstream if they matter). Bin edges
    come back as columns so the result is self-describing.
    """
    width = (float(hi) - float(lo)) / int(nbins)
    v = F.col(value).cast("double")
    b = F.floor((v - F.lit(float(lo))) / F.lit(width)).cast("int")
    return (
        df.where((v >= lo) & (v < hi))
        .withColumn("bin", b)
        .groupBy(key, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            key,
            "bin",
            (F.lit(float(lo)) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            (F.lit(float(lo)) + (F.col("bin") + 1) * F.lit(width)).alias("bin_hi"),
            "n",
        )
    )


def pmi_bigrams(
    df: DataFrame,
    text: str = "text",
    min_count: int = 3,
    top_k: int = 20,
) -> DataFrame:
    """Collocation extraction: top-k bigrams by pointwise mutual
    information, PMI = ln(p(ab) / (p(a)·p(b))) — the classic "these
    words belong together" signal for phrase mining / tokenizer vocab
    seeding. Unigram and bigram counting are each one combinable
    shuffle; the PMI join is keyed by token (the unigram table), and
    the one-row totals broadcast. ``min_count`` filters the unstable
    low-frequency tail before scoring; ranking uses the portably
    rounded PMI so ordering can't straddle a ulp.
    """
    # ASCII fold, not lower(): token strings are GROUP KEYS here, and
    # full-vs-simple Unicode case mapping diverges between the engines
    # (fuzz find, unicode profile — see operators/text.ascii_lower_col)
    toks = F.split(ascii_lower_col(F.col(text)), " ")
    uni = (
        df.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    t_tot = uni.agg(F.sum("c").cast("long").alias("t_tot"))
    bigrams = F.expr(
        "zip_with(slice(_toks, 1, size(_toks) - 1), "
        "slice(_toks, 2, size(_toks) - 1), (a, b) -> concat(a, ' ', b))"
    )
    bc = (
        df.withColumn("_toks", toks)
        .where(F.size("_toks") >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    b_tot = bc.agg(F.sum("cb").cast("long").alias("b_tot"))
    parts = bc.where(F.col("cb") >= min_count).withColumn(
        "tok_a", F.split(F.col("bigram"), " ")[0]
    ).withColumn("tok_b", F.split(F.col("bigram"), " ")[1])
    ua = uni.select(F.col("tok").alias("tok_a"), F.col("c").alias("ca"))
    ub = uni.select(F.col("tok").alias("tok_b"), F.col("c").alias("cbb"))
    scored = (
        parts.join(ua, "tok_a")
        .join(ub, "tok_b")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(b_tot))
    )
    p_ab = F.col("cb").cast("double") / F.col("b_tot").cast("double")
    p_a = F.col("ca").cast("double") / F.col("t_tot").cast("double")
    p_b = F.col("cbb").cast("double") / F.col("t_tot").cast("double")
    pmi = pround(F.log(p_ab / (p_a * p_b)), 6)
    return (
        scored.select("bigram", F.col("cb").alias("n"), pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "bigram")
        .limit(top_k)
    )


def ab_test_lift(
    events: DataFrame,
    user_col: str = "user_id",
    event_type_col: str = "event_type",
    conversion_event: str = "purchase",
) -> DataFrame:
    """Two-proportion A/B analysis over a deterministic 50/50 user
    split: assign each user an arm by md5 bucket (stable under reruns
    and engines — never rand()), measure per-arm conversion (did the
    user ever fire the conversion event), and report the lift and the
    pooled two-proportion z statistic.

    One user-keyed aggregation builds the (user, arm, converted)
    table; the final statistic reduces #users rows. All arithmetic
    after the counts is scalar double math on exact integers (sqrt is
    IEEE-exact), portably rounded.
    """
    from oracle_to_oracle_data_integration_pipeline_spark.operators.sampling import (
        hash_bucket_col,
    )

    users = (
        events.groupBy(user_col)
        .agg(
            F.max(
                F.when(F.col(event_type_col) == conversion_event, 1).otherwise(0)
            ).alias("converted")
        )
        .withColumn("arm", hash_bucket_col(F.col(user_col), 2))
    )
    per_arm = users.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    # conditional aggregation (not filter + crossJoin): the readout is
    # ALWAYS one row, with NULL stats when an arm is empty, instead of
    # silently vanishing on degenerate inputs
    j = per_arm.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("conv_b"),
    )
    pa = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pool
        * (F.lit(1.0) - pool)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return j.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        pround(pa, 6).alias("rate_a"),
        pround(pb, 6).alias("rate_b"),
        pround(pa - pb, 6).alias("lift"),
        F.when(se > 0, pround((pa - pb) / se, 6)).alias("z_score"),
    )


def spearman_corr(df: DataFrame, x: str, y: str) -> DataFrame:
    """Spearman rank correlation of two (low-cardinality) columns with
    classical average-rank tie handling. One row: (n, spearman).

    Only COMPLETE pairs participate: rows null in either column are
    dropped before the frequency tables are built (a null row must not
    shift the other column's ranks). Ranks come from per-column VALUE
    FREQUENCY tables, not a global row sort:
    avg-rank(v) = cnt_less(v) + (cnt_eq(v)+1)/2, computed with a
    window over the |distinct| table (bounded by the value
    cardinality, never the corpus) and broadcast back. Doubled ranks
    (2r is integral even at .5 ties) make every per-row product exact;
    the sums accumulate in DECIMAL (the long-sum would wrap at
    n ≈ 1.9M where Σ(2r)² ≈ 4n³/3 exceeds int64) and convert to
    double only for the final Pearson-on-ranks formula — identical
    bit-for-bit in any engine since the inputs are exact integers.
    The rank-table joins carry no broadcast hint: small tables
    broadcast via the planner threshold; a high-cardinality column
    degrades to a shuffle join instead of OOMing the driver. (The
    cumulative-count window over each rank table is still bounded by
    that column's |distinct| — for a truly continuous column,
    pre-bucket or sample first.)
    """
    base = df.select(x, y).where(F.col(x).isNotNull() & F.col(y).isNotNull())

    def rank2_table(col: str, alias: str) -> DataFrame:
        freq = base.groupBy(F.col(col).alias("v")).agg(F.count(F.lit(1)).alias("c"))
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
        return freq.select(
            F.col("v").alias(col),
            (
                2 * F.coalesce(F.sum("c").over(w), F.lit(0)) + F.col("c") + 1
            ).alias(alias),
        )

    def dec_sum(col):
        return F.sum(col.cast("decimal(38,0)")).cast("double")

    rx = rank2_table(x, "rx2")
    ry = rank2_table(y, "ry2")
    # no explicit broadcast hint on the rank tables: under the size
    # threshold Spark broadcasts them anyway (plan test pins that at
    # fixture scale), and on a HIGH-cardinality column the planner
    # falls back to a shuffle join instead of force-shipping an
    # unbounded |distinct| table to the driver (an explicit hint would
    # override the threshold and OOM — the unigram_nll rationale,
    # operators/retrieval.py)
    joined = base.join(rx, x).join(ry, y)
    agg = joined.agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum(F.col("rx2")).alias("sx"),
        dec_sum(F.col("ry2")).alias("sy"),
        dec_sum(F.col("rx2") * F.col("rx2")).alias("sxx"),
        dec_sum(F.col("ry2") * F.col("ry2")).alias("syy"),
        dec_sum(F.col("rx2") * F.col("ry2")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return agg.select(
        "n", F.when(den > 0, pround(num / den, 6)).alias("spearman")
    )


def embed_gram(emb: DataFrame, dim: int, vec_col: str = "embedding") -> DataFrame:
    """Distributed Gram matrix XᵀX of the embedding column (upper
    triangle): the one-pass statistic behind PCA whitening, covariance
    drift checks, and IVF/OPQ codebook training over a vector corpus.

    100 TB shape: ``mapInPandas`` computes a per-partition PARTIAL
    Gram with a vectorized numpy kernel — one Python call per batch,
    dim·(dim+1)/2 output rows per partition regardless of row count —
    then one combinable shuffle of those tiny partials sums cell-wise.
    No explode: a per-pair explode would multiply the corpus by
    dim²/2 rows (4096× at dim=64) before aggregating; here the blowup
    never leaves the numpy kernel. The plan gate pins "no Generate
    node".

    Determinism: each per-row product x_i·x_j (exact in float64 for
    float32 inputs) is quantized half-up to 9 dp as an int64 —
    ``floor(p·1e9 + 0.5)`` — so partial sums are EXACT integers and
    any partition layout or partial-agg tree produces identical bits.
    int64 headroom: |x|≤1-ish fixtures give ≤~1e9 per term, so ~9e9
    rows per cell before overflow; at larger scale raise the schema to
    DECIMAL or drop ``scale`` a digit.

    Output: i, j (0-based, i ≤ j), gram_q9 (exact integer, units of
    1e-9), gram (double, gram_q9/1e9 — deterministic IEEE division).
    SQL twin: lateral range-join over (i, j) pairs with the identical
    floor quantization.
    """
    scale = 1e9

    def _partial(batches):
        import numpy as np
        import pandas as pd

        acc = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            seen = True
            for i in range(dim):
                prod = x[:, i : i + 1] * x[:, i:]
                acc[i, i:] += (
                    np.floor(prod * scale + 0.5).astype(np.int64).sum(axis=0)
                )
        if not seen:
            return
        iu = np.triu_indices(dim)
        yield pd.DataFrame(
            {"i": iu[0].astype("int32"), "j": iu[1].astype("int32"), "pq": acc[iu]}
        )

    parts = emb.select(vec_col).mapInPandas(_partial, schema="i int, j int, pq long")
    g = parts.groupBy("i", "j").agg(F.sum("pq").alias("gram_q9"))
    return g.select(
        "i", "j", "gram_q9",
        (F.col("gram_q9").cast("double") / F.lit(scale)).alias("gram"),
    )
