"""Similarity search over embedding columns (array<float>).

- ``cosine_topk_bruteforce`` — exact baseline: query-set × candidates
  cross join with a JVM-side dot product (zip_with + aggregate; no
  UDF). At scale this is only sane for a bounded query set: cost is
  |Q|×N×dim. The candidates side broadcasts the (small) query set, so
  the big side never shuffles.
- ``lsh_topk`` — the scale path: random-hyperplane LSH. Each vector
  gets a sign-bit bucket from k fixed hyperplanes (literal arrays
  broadcast into the plan); only same-bucket (and optionally
  near-bucket) pairs are scored. Sub-linear candidate sets at 100 TB,
  tunable recall. An IVF variant would k-means the space instead;
  hyperplane LSH is chosen here because it is pure expression algebra
  (no iterative fit).

Dot products cast each float to double before multiply so results are
bit-identical to the DuckDB oracle's DOUBLE[] arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _q(name: str) -> str:
    """Backtick-quote a (possibly alias-qualified) column name for the
    parsed fast paths below."""
    return ".".join(f"`{part}`" for part in name.split("."))


def _hof_dot_sql(a: str, b: str) -> str:
    """SQL text of the dot-product fold — token-identical to the
    Column form below (same casts, same left-to-right aggregate)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
    )


def dot_col(a: Column | str, b: Column | str) -> Column:
    """Dot product. String inputs (column names, optionally
    alias-qualified) take the parsed-SQL fast path: the python-lambda
    HOF form costs ~28 ms of py4j round trips PER CALL to construct vs
    ~1 ms parsed (round 11 cProfile — plan construction, not
    execution, dominated the similarity queries' driver gap). Same
    expression tree either way."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_hof_dot_sql(_q(a), _q(b)))
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm_col(a: Column | str) -> Column:
    if isinstance(a, str):
        return F.expr(f"sqrt({_hof_dot_sql(_q(a), _q(a))})")
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def _cosine_from_norms(
    a: Column | str, b: Column | str, na: Column | str, nb: Column | str
) -> Column:
    """Cosine with the norms projected BEFORE the join: ``norm_col`` is
    a dim-length HOF aggregate, so evaluating it inside the pair score
    recomputes each vector's norm once per candidate pair. Precomputing
    sqrt(dot(v,v)) per side cuts the HOF work per pair from 3 aggregates
    to 1. IEEE-identical to ``cosine_col`` (same ops, same order), so
    oracles need no change. String inputs take the parsed fast path
    (see dot_col)."""
    if all(isinstance(v, str) for v in (a, b, na, nb)):
        return F.expr(
            f"{_hof_dot_sql(_q(a), _q(b))} / ({_q(na)} * {_q(nb)})"
        )
    return dot_col(a, b) / (na * nb)


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Ranking is on the *rounded* cosine with id tiebreak, so ordering is
    reproducible across engines and runs.
    Output: query_id, neighbor_id, cosine, rank.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm_col(vec_col).alias("qn"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        norm_col(vec_col).alias("cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _cosine_from_norms("qvec", "cvec", "qn", "cn"), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def neardup_pairs_bruteforce(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (d1 < d2) with cosine ≥ threshold — embedding-space
    near-duplicate detection. Quadratic: the exact TEST-SIDE verifier
    for ``neardup_pairs_lsh`` below, never the production path."""
    a = embeddings.select(
        F.col(id_col).alias("d1"),
        F.col(vec_col).alias("v1"),
        norm_col(vec_col).alias("n1"),
    )
    b = embeddings.select(
        F.col(id_col).alias("d2"),
        F.col(vec_col).alias("v2"),
        norm_col(vec_col).alias("n2"),
    )
    return (
        a.crossJoin(b)
        .filter(F.col("d1") < F.col("d2"))
        .select(
            "d1",
            "d2",
            F.round(
                _cosine_from_norms("v1", "v2", "n1", "n2"), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def neardup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float,
    n_bands: int = 8,
    band_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sub-quadratic near-duplicate pairs: banded hyperplane LSH
    candidate generation + exact cosine verify.

    Scale shape (the reason this replaces the crossJoin):
    - Each vector gets ``n_bands`` sign-bit bucket ids (``band_planes``
      hyperplanes per band). The explode emits only (id, band, bucket)
      — 8 tiny rows per vector; the dim-length arrays DO NOT ride the
      candidate-generation shuffle.
    - Candidates = equi-join on (band, bucket): shuffle-by-key, never a
      CartesianProduct/BroadcastNestedLoopJoin node.
    - DISTINCT pair ids, then the vectors join back by id (one shuffle
      of each vector) and only candidate pairs pay the exact dot
      product, with per-side norms precomputed.

    Recall is the standard banded-LSH S-curve: P(candidate) =
    1-(1-p^P)^B with p = 1-θ/π. At a true near-dup threshold (cos≥0.9)
    the default 8×4 bands keep ~99% recall while scoring a vanishing
    corpus fraction; at loose thresholds widen B / shrink P. The
    brute-force twin above is the test-side verifier.
    """
    from oracle_to_oracle_data_integration_pipeline_spark.operators.cache_registry import (
        persist_tracked,
    )

    planes = _hyperplanes(dim, n_bands * band_planes)
    bands = [planes[i * band_planes : (i + 1) * band_planes] for i in range(n_bands)]
    # sig (id, vector, norm, band buckets) feeds THREE consumers — the
    # banded self-join and both exact-verify sides — and the bucket
    # projection is n_bands×band_planes HOF dot products per row, so an
    # uncached sig recomputes the most expensive projection in the
    # operator once per consumer (round 10: embed_neardup spent 3× the
    # signature cost). Registry-tracked stage persist, recomputed from
    # input every call.
    #
    # Round 11 (profile: four sequential ~770 ms single-task jobs at
    # sf0.1): (1) hash-rebalance the input first — a single-file
    # fixture otherwise runs the interpreted 32×dim dot products as
    # ONE task, and at real scale the repartition is a no-op-shaped
    # rebalance (dedup._spread rationale); (2) materialize the persist
    # with ONE uncontended action before the multi-branch plan runs —
    # AQE executes the consumer stages as concurrent jobs, and a cold
    # cache convoys them into recomputing/waiting on the same blocks
    # (the minhash_dedup_pairs count() fix, round 10).
    n_part = embeddings.sparkSession.sparkContext.defaultParallelism
    sig = persist_tracked(
        embeddings.repartition(n_part, F.col(id_col)).select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            norm_col(vec_col).alias("nrm"),
            *[lsh_bucket_col(vec_col, b).alias(f"b{i}") for i, b in enumerate(bands)],
        ),
        "similarity_lsh",
        replace=True,  # one live copy per session (ADVICE round 10)
    )
    sig.count()
    keyed = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band"), F.col(f"b{i}").alias("bucket"))
                    for i in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    cand = (
        keyed.alias("a")
        .join(keyed.alias("c"), ["band", "bucket"])
        .filter(F.col("a.id") < F.col("c.id"))
        .select(F.col("a.id").alias("d1"), F.col("c.id").alias("d2"))
        .distinct()
    )
    s1 = sig.select(F.col("id").alias("d1"), F.col("v").alias("v1"), F.col("nrm").alias("n1"))
    s2 = sig.select(F.col("id").alias("d2"), F.col("v").alias("v2"), F.col("nrm").alias("n2"))
    return (
        cand.join(s1, "d1")
        .join(s2, "d2")
        .select(
            "d1",
            "d2",
            F.round(
                _cosine_from_norms("v1", "v2", "n1", "n2"), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG, no numpy runtime
    dependency in the plan — the planes become literal arrays)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 33) / float(1 << 31)) - 1.0)  # [-1, 1)
        planes.append(row)
    return planes


def _dot_sql(vec_sql: str, plane: list[float]) -> str:
    """SQL text of ``dot_col(vec, literal plane)`` — ``repr(float)``
    round-trips each double exactly and the whole plane parses as ONE
    Catalyst call instead of dim py4j ``F.lit`` round-trips (the kmeans
    ``_sqdist_sql`` rationale, round 10: 32 planes × 64 literals cost
    ~2 s of driver-side Column construction per signature projection)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.clustering import _dlit

    arr = ", ".join(_dlit(x) for x in plane)
    return (
        f"aggregate(zip_with({vec_sql}, array({arr}), "
        f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"0.0D, (acc, x) -> acc + x)"
    )


def lsh_bucket_col(vec: Column | str, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from fixed hyperplanes (pure expressions).
    ``vec`` may be a column NAME (preferred — enables the one-shot
    parsed form) or an arbitrary Column (py4j literal fallback)."""
    if isinstance(vec, str):
        bits = " + ".join(
            f"(CASE WHEN {_dot_sql(vec, p)} >= 0 THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        )
        return F.expr(f"CAST({bits} AS INT)")
    bucket = None
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot_col(vec, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only candidates whose LSH bucket is
    within ``probe_hamming`` sign-bit flips of the query's bucket
    (multi-probe LSH). With 4 planes and probe 1 the corpus shrinks to
    ~5/16 of N; recall for cos≈0.5 neighbors is ~0.6 vs ~0.2 for
    exact-bucket only (sign-agreement p = 1-θ/π per plane). At 100 TB
    tune n_planes up and probe to hold the candidate budget."""
    from pyspark.sql import Window

    planes = _hyperplanes(dim, n_planes)
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        norm_col(vec_col).alias("cn"),
        lsh_bucket_col(vec_col, planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm_col(vec_col).alias("qn"),
        lsh_bucket_col(vec_col, planes).alias("qbucket"),
    )
    probe = F.bit_count(
        F.col("bucket").bitwiseXOR(F.col("qbucket")).cast("long")
    ) <= probe_hamming
    scored = (
        c.join(F.broadcast(q), probe)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _cosine_from_norms("qvec", "cvec", "qn", "cn"), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: DataFrame | None = None,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: partition the corpus into inverted
    cells by nearest centroid, probe only the query's ``nprobe``
    closest cells.

    ``centroids`` is any small (cid, cvec) table — in production the
    output of an offline k-means fit. When omitted, the first
    ``n_cells`` corpus vectors (lowest ids) seed the cells, which keeps
    the operator deterministic and oracle-checkable without an
    iterative fit in the plan.

    Scale shape: cell assignment is a broadcast of C centroids against
    the corpus — |N|·C dot products map-side, no shuffle of the big
    side; the probe join shuffles only by cell id, and each query
    scores ~nprobe/C of the corpus. Recall/cost is tuned by
    (n_cells, nprobe) exactly as FAISS IVF's (nlist, nprobe).

    Output: query_id, neighbor_id, cosine (rounded 6), rank.
    """
    from pyspark.sql import Window

    if centroids is None:
        # genuinely the n_cells lowest ids — an id-range filter would
        # silently yield fewer (or zero) centroids on sparse or
        # non-zero-based id spaces
        centroids = (
            embeddings.orderBy(F.col(id_col))
            .limit(n_cells)
            .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        )
    cent = F.broadcast(
        centroids.select("cid", "cvec", norm_col("cvec").alias("centn"))
    )

    def assign(df: DataFrame, idc: str, out_id: str, out_vec: str, out_n: str, keep: int) -> DataFrame:
        scored = (
            df.select(
                F.col(idc).alias(out_id),
                F.col(vec_col).alias(out_vec),
                norm_col(vec_col).alias(out_n),
            )
            .join(cent)
            .select(
                out_id,
                out_vec,
                out_n,
                "cid",
                _cosine_from_norms(out_vec, "cvec", out_n, "centn").alias("c_cos"),
            )
        )
        w = Window.partitionBy(out_id).orderBy(F.col("c_cos").desc(), F.col("cid"))
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= keep)
            .select(out_id, out_vec, out_n, "cid")
        )

    cells = assign(embeddings, id_col, "neighbor_id", "cvec2", "cn", 1)
    probes = assign(queries, id_col, "query_id", "qvec", "qn", nprobe)
    # no pair dedup needed: each neighbor lives in exactly ONE cell
    # (row_number keep=1) and a probe's cids are distinct, so a
    # (query, neighbor) pair joins at most once — an agg here would be
    # a pure extra exchange
    scored = (
        cells.join(probes, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _cosine_from_norms("qvec", "cvec2", "qn", "cn"), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    keep_vec: bool = False,
) -> DataFrame:
    """Symmetric per-vector integer quantization of an embedding
    column: scale = (2^(bits-1)-1) / max|x|, q_i = floor(x_i·scale
    + 0.5). At 100 TB embedding corpora this is the 4× (fp32→int8)
    storage/shuffle lever; per-vector scales keep it a pure row-local
    expression — no global pass, no shuffle, whole-stage codegen.

    floor(x+0.5) (not round()) keeps the rounding rule engine-portable:
    SQL round() half-rule differs across engines (HALF_UP vs half-even)
    but floor is floor everywhere.

    Output: (id_col, qvec array<int>, scale double) — dequantize with
    q_i / scale. ``keep_vec=True`` carries the source vector column
    through, so callers needing both (e.g. reconstruction-error audits)
    stay a single zero-shuffle projection instead of joining back.
    """
    qmax = float(2 ** (bits - 1) - 1)
    maxabs = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x)))
    scale = F.when(maxabs > 0, F.lit(qmax) / maxabs).otherwise(F.lit(0.0))
    q = F.transform(
        F.col(vec_col), lambda x: F.floor(x * F.col("__scale__") + F.lit(0.5)).cast("int")
    )
    keep = [vec_col] if keep_vec else []
    return (
        df.withColumn("__scale__", scale)
        .select(
            id_col,
            *keep,
            q.alias("qvec"),
            F.col("__scale__").alias("scale"),
        )
    )


def l2_normalize(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Unit-normalize an embedding column: v / ||v||, plus the norm.

    Row-local expression over the array (sequential fold for the norm,
    element-wise transform for the scaling) — zero shuffle, runs inside
    whole-stage codegen at any scale. Zero vectors pass through
    unscaled with norm 0 rather than dividing by zero. Components are
    portably rounded so the result hashes identically across engines.
    """
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import pround

    v = F.col(vec_col)
    norm = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))
    )
    p = float(10**round_to)
    unit = F.when(
        F.col("_norm") > 0,
        F.transform(
            v, lambda x: F.floor(x.cast("double") / F.col("_norm") * p + F.lit(0.5)) / p
        ),
    ).otherwise(F.transform(v, lambda x: x.cast("double")))
    return (
        df.withColumn("_norm", norm)
        .select(
            id_col,
            pround(F.col("_norm"), round_to).alias("norm"),
            unit.alias("unit_vec"),
        )
    )
