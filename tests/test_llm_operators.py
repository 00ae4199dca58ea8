"""Unit tests for the LLM-data operators: planted near-dup recovery,
LSH vs brute-force agreement, stub gating for multimodal decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_neardup_pairs,
)
from oracle_to_oracle_data_integration_pipeline_spark.operators.multimodal import decode_media
from oracle_to_oracle_data_integration_pipeline_spark.operators.similarity import (
    ivf_topk,
    cosine_topk_bruteforce,
    lsh_topk,
)
from oracle_to_oracle_data_integration_pipeline_spark.operators.text import shingles_col
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents").cache()


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "one two"), (2, "a b c d")], "doc_id long, text string")
    rows = {r["doc_id"]: r["s"] for r in df.select("doc_id", shingles_col().alias("s")).collect()}
    assert rows[1] == []  # < n tokens → empty, not a descending-sequence artifact
    assert rows[2] == ["a b c", "b c d"]


def test_exact_dedup_finds_planted_copies(spark, docs):
    planted = docs.filter(F.col("doc_id") < 50).select("doc_id", "text")
    both = docs.select("doc_id", "text").union(planted)
    groups = exact_dedup_groups(both).collect()
    assert len(groups) == 50
    assert all(r["n_copies"] == 2 for r in groups)


def test_minhash_equals_exact_jaccard(spark, docs):
    """The LSH path with verification must reproduce the exact
    all-pairs result at the planted-pair threshold."""
    exact = {(r["d1"], r["d2"]) for r in ngram_jaccard_pairs(docs, 0.5).collect()}
    lsh = {(r["d1"], r["d2"]) for r in minhash_dedup_pairs(docs, 0.5).collect()}
    assert exact == lsh
    assert len(exact) > 0  # fixture plants near-dups; vacuous test guard


def test_lsh_candidates_superset_of_high_jaccard(spark, docs):
    sig = minhash_signatures(docs)
    cand = {(r["d1"], r["d2"]) for r in minhash_lsh_candidates(sig).collect()}
    high = {(r["d1"], r["d2"]) for r in ngram_jaccard_pairs(docs, 0.9).collect()}
    assert high <= cand


def test_simhash_finds_near_dups(spark, docs):
    """SimHash at small Hamming distance should recover mostly the
    planted near-dup pairs (different signal, same planted structure)."""
    sim = {(r["d1"], r["d2"]) for r in simhash_neardup_pairs(docs, max_hamming=3).collect()}
    exact = {(r["d1"], r["d2"]) for r in ngram_jaccard_pairs(docs, 0.9).collect()}
    assert len(sim & exact) >= len(exact) * 0.6  # recall on planted pairs
    # precision guard: shouldn't explode into the 124k possible pairs
    assert len(sim) < 500


def test_cosine_topk_rank_contract(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    out = cosine_topk_bruteforce(e, e.filter(F.col("vec_id") < 3), k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        cosines = [r["cosine"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["neighbor_id"] != q for r in rows)


def test_lsh_topk_subset_of_bucket(spark, sf_dir):
    """LSH top-k returns plausible ranks and only same-bucket
    neighbors; top-1 agreement with brute force is the recall signal."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    brute = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk_bruteforce(e, q, k=1).collect()}
    approx = lsh_topk(e, q, k=5).collect()
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
    # every query produced candidates (buckets are non-degenerate)
    assert {r["query_id"] for r in approx} == set(range(10))
    # approximate recall: at least some exact top-1s survive bucketing
    assert len(brute & approx_pairs) >= 3


def test_decode_media_stub_gated():
    with pytest.raises(NotImplementedError):
        decode_media(b"bytes", fake=False)
    meta = decode_media(b"x" * 100, fake=True)
    assert meta == {"n_bytes": 100, "width": 100 % 64 + 1, "height": 100 % 37 + 1, "fmt": "fake"}


def test_ivf_topk_probes_cells(spark, sf_dir):
    """IVF top-k: every query produces ranked candidates, ranks are
    contiguous from 1, and top-1 agreement with brute force is the
    recall signal (2 of 8 cells probed)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    brute = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk_bruteforce(e, q, k=1).collect()}
    approx = ivf_topk(e, q, k=5, n_cells=8, nprobe=2).collect()
    by_q = {}
    for r in approx:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(by_q) == set(range(10))
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert len(brute & approx_pairs) >= 3


def test_neardup_lsh_pairs_subset_with_recall(spark, sf_dir):
    """The banded-LSH near-dup pairs must be a SUBSET of the exact
    brute-force pairs (no false positives survive the exact verify) and
    recall the strongest pairs: every brute-force pair with cosine well
    above the qid threshold must be found."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.similarity import (
        neardup_pairs_bruteforce,
        neardup_pairs_lsh,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r["d1"], r["d2"]): r["cosine"]
        for r in neardup_pairs_bruteforce(e, 0.4).collect()
    }
    lsh = {
        (r["d1"], r["d2"]): r["cosine"]
        for r in neardup_pairs_lsh(e, 0.4).collect()
    }
    assert set(lsh) <= set(exact)
    for pair, cos in lsh.items():
        assert cos == exact[pair]
    # the top-cosine exact pairs are the planted-near-dup proxy; banded
    # LSH must not miss the strongest ones
    strongest = sorted(exact, key=exact.get, reverse=True)[:5]
    found = sum(1 for p in strongest if p in lsh)
    assert found >= 4, f"LSH missed {5 - found} of the 5 strongest pairs"


def test_ngram_jaccard_hot_shingle_cap(spark, docs):
    """max_shingle_df drops only intersections that run through hot
    shingles: with a cap above every shingle's document frequency the
    result is identical to exact; with a tight cap the result is a
    subset with under-estimated (never inflated) scores."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    exact = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, 0.0).collect()
    }
    loose = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, 0.0, max_shingle_df=10**6).collect()
    }
    assert loose == exact
    capped = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, 0.0, max_shingle_df=2).collect()
    }
    assert set(capped) <= set(exact)
    for pair, jac in capped.items():
        assert jac <= exact[pair] + 1e-9


def test_connected_components_path_graph(spark):
    """A path graph 1-2-3-4 needs multiple propagation rounds to pull
    node 4 down to label 1; node 9 is isolated and labels itself."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 8)], ["d1", "d2"]
    )
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 7, 8, 9)], ["doc_id"])
    out = {
        r["doc_id"]: r["comp"]
        for r in connected_components(edges, nodes=nodes).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 8: 7, 9: 9}


def test_connected_components_nonconvergence_guard(spark):
    from oracle_to_oracle_data_integration_pipeline_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame([(1, 2), (2, 3)], ["d1", "d2"])
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_iter=1)


def test_sample_frames_fanout_shape(spark):
    """1:N fan-out inside the Arrow batch: 300 bytes / 64-byte frames
    with stride 2 -> frames 0,2,4 sized 64,64,44; max_frames truncates."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame([(1, bytearray(b"x" * 300))], "doc_id long, payload binary")
    rows = sorted(
        (r["frame_idx"], r["frame_bytes"]) for r in sample_frames(df).collect()
    )
    assert rows == [(0, 64), (2, 64), (4, 44)]
    capped = sample_frames(
        spark.createDataFrame([(1, bytearray(b"x" * 10000))], "doc_id long, payload binary"),
        max_frames=4,
    ).count()
    assert capped == 4


def test_resize_and_features_contract(spark):
    from oracle_to_oracle_data_integration_pipeline_spark.operators.multimodal import (
        extract_features,
        resize_media,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"a" * 2000)), (2, bytearray(b"b" * 10))],
        "doc_id long, payload binary",
    )
    rz = {r["doc_id"]: r["n_bytes_out"] for r in resize_media(df, 32, 32).collect()}
    assert rz == {1: 1024, 2: 10}  # capped by raster vs passthrough
    ft = {r["doc_id"]: r["features"] for r in extract_features(df, dim=4).collect()}
    assert len(ft[1]) == 4
    assert ft[1] == [float((2000 * (i + 1)) % 97) / 97.0 for i in range(4)]


def test_real_decode_path_raises(spark):
    from oracle_to_oracle_data_integration_pipeline_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id long, payload binary")
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        sample_frames(df, fake=False).collect()


def test_connected_components_random_graphs_vs_union_find(spark):
    """Randomized parity with a driver-side union-find on graphs with
    chains, cliques, and isolated nodes (seeded — deterministic)."""
    import random

    from oracle_to_oracle_data_integration_pipeline_spark.operators.dedup import (
        connected_components,
    )

    rng = random.Random(42)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(10, 50))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # normalize: label = min member of the component
        comp_min = {}
        for v in range(n):
            comp_min.setdefault(find(v), []).append(v)
        expected = {v: min(vs) for r, vs in comp_min.items() for v in vs}

        edf = spark.createDataFrame(edges or [(0, 0)], ["d1", "d2"])
        ndf = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
        got = {
            r["doc_id"]: r["comp"]
            for r in connected_components(edf, nodes=ndf).collect()
        }
        assert got == expected, f"trial {trial} mismatch"


def test_connected_components_string_ids(spark):
    """Non-numeric id path (hash-image convergence probe)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame([("a", "b"), ("b", "c"), ("x", "y")], ["d1", "d2"])
    out = {r["doc_id"]: r["comp"] for r in connected_components(edges, id_col="doc_id").collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_quantize_embeddings_invariants(spark):
    """int8 range respected, dequant error bounded by 0.5/scale, zero
    vectors quantize to zeros with scale 0."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.similarity import (
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert rows[1]["qvec"] == [64, -127, 32]  # scale = 127
    assert abs(rows[1]["scale"] - 127.0) < 1e-9
    assert rows[2]["qvec"] == [0, 0, 0] and rows[2]["scale"] == 0.0
    # reconstruction error bound
    for qi, xi in zip(rows[1]["qvec"], [0.5, -1.0, 0.25]):
        assert abs(qi / 127.0 - xi) <= 0.5 / 127.0 + 1e-9


def test_connected_components_long_path_needs_shortcut(spark):
    """A 120-node path has diameter 119: plain propagation cannot
    converge in 12 rounds, pointer-jumping does (O(log d))."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame([(i, i + 1) for i in range(119)], ["d1", "d2"])
    out = connected_components(edges, max_iter=12, shortcut=True)
    comps = {r["comp"] for r in out.collect()}
    assert comps == {0}
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_iter=12, shortcut=False)


def test_decontaminate_kernel_matches_explode_join_reference(spark):
    """Round 11: decontaminate counts eval-shingle hits inside the
    Arrow kernel (no explode, no join). Pin exact equivalence to the
    old explode + broadcast-join + groupBy form on a hostile little
    corpus: NULL text, short docs, duplicate ids across rows, docs
    with repeated shingles, and a min_overlap boundary."""
    from pyspark.sql import functions as F

    from oracle_to_oracle_data_integration_pipeline_spark.operators.dedup import (
        _exploded_shingles,
        decontaminate,
    )

    train = spark.createDataFrame(
        [
            (1, "a b c d e"),          # shares 'a b c','b c d','c d e'
            (2, "x y z"),              # shares 'x y z' only
            (3, None),                 # NULL text -> never flagged
            (4, "q r"),                # short doc -> never flagged
            (5, "a b c a b c a b c"),  # repeated shingles stay DISTINCT per row
            (5, "b c d x y z"),        # duplicate id: counts add across rows
            (None, "a b c d"),         # NULL ids group as ONE key,
            (None, "b c d e"),         # like groupBy(NULL) did
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(10, "a b c d"), (11, "x y z w")], "doc_id long, text string"
    )
    for k in (1, 2, 3):
        got = {
            (r["doc_id"], r["n_hit"])
            for r in decontaminate(train, ev, n=3, min_overlap=k).collect()
        }
        ref_hits = _exploded_shingles(train, "text", "doc_id", 3).join(
            F.broadcast(
                _exploded_shingles(ev, "text", "doc_id", 3).select("sh").distinct()
            ),
            "sh",
        )
        ref = {
            (r["doc_id"], r["n_hit"])
            for r in ref_hits.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_hit"))
            .filter(F.col("n_hit") >= k)
            .collect()
        }
        assert got == ref, (k, got, ref)


def test_connected_components_auto_shortcut_deep_and_shallow(spark):
    """shortcut="auto" (round 11): plain rounds first, pointer jump
    joins in after 3 rounds — the 120-node path still converges inside
    a budget plain propagation alone cannot meet, and a near-clique
    graph labels identically to shortcut=True."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.dedup import (
        connected_components,
    )

    path = spark.createDataFrame([(i, i + 1) for i in range(119)], ["d1", "d2"])
    out = connected_components(path, max_iter=15, shortcut="auto")
    assert {r["comp"] for r in out.collect()} == {0}

    clique = spark.createDataFrame(
        [(a, b) for a in range(5) for b in range(a + 1, 5)] + [(10, 11)],
        ["d1", "d2"],
    )
    want = {r["doc_id"]: r["comp"] for r in connected_components(clique, shortcut=True).collect()}
    got = {r["doc_id"]: r["comp"] for r in connected_components(clique, shortcut="auto").collect()}
    assert got == want
