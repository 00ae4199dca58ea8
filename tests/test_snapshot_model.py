"""Model-based test of SnapshotStore: a random SEQUENCE of operations
(commit / merge / compact / vacuum / time-travel reads) executed
against both the store and a trivial in-memory model (dict of
version → rows). The store is transactional machinery; the model is
20 lines of Python — any divergence over any operation order is a
bug in the machinery, which is exactly what example-based tests miss.

Spark calls dominate runtime, so rows are tiny and examples few; the
value is the OPERATION-ORDER coverage, not data volume.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracle_to_oracle_data_integration_pipeline_spark.sources.snapshots import SnapshotStore

T0 = datetime.datetime(2024, 1, 1)
SCHEMA = "id long, val string, created_at timestamp, updated_at timestamp, is_deleted string"


def _apply_merge(state: dict, delta: list) -> dict:
    """The 10-line model of merge_soft_delete: matched keys take the
    delta row (incl. tombstones); unmatched non-tombstones insert;
    unmatched tombstones drop."""
    out = dict(state)
    for (k, val, dele) in delta:
        if k in out or dele == "N":
            out[k] = (val, dele)
    return out


ops_strategy = st.lists(
    st.one_of(
        st.tuples(
            st.just("commit"),
            st.lists(
                st.tuples(st.integers(0, 5), st.sampled_from(["a", "b"])),
                min_size=1,
                max_size=4,
                unique_by=lambda t: t[0],
            ),
        ),
        st.tuples(
            st.just("merge"),
            st.lists(
                st.tuples(
                    st.integers(0, 5),
                    st.sampled_from(["x", "y"]),
                    st.sampled_from(["N", "N", "Y"]),
                ),
                min_size=1,
                max_size=4,
                unique_by=lambda t: t[0],
            ),
        ),
        st.tuples(st.just("compact"), st.none()),
        st.tuples(st.just("vacuum"), st.none()),
        st.tuples(st.just("restore"), st.integers(0, 100)),
    ),
    min_size=2,
    max_size=6,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ops_strategy)
def test_store_matches_model_over_operation_sequences(spark, tmp_path_factory, ops):
    store = SnapshotStore(spark, str(tmp_path_factory.mktemp("wh")))
    # model: version -> {id: (val, is_deleted)}; starts with a seed commit
    versions: dict[int, dict] = {}
    state: dict = {0: ("seed", "N")}
    store.commit(
        spark.createDataFrame([(0, "seed", T0, None, "N")], SCHEMA), "t"
    )
    versions[0] = dict(state)
    vacuumed_below = 0

    for op, arg in ops:
        if op == "commit":
            state = {k: (v, "N") for k, v in arg}
            v = store.commit(
                spark.createDataFrame(
                    [(k, val, T0, None, "N") for k, val in arg], SCHEMA
                ),
                "t",
            )
        elif op == "merge":
            state = _apply_merge(state, arg)
            v, _ = store.merge(
                spark.createDataFrame(
                    [(k, val, T0, T0, d) for k, val, d in arg], SCHEMA
                ),
                "t",
                ["id"],
            )
        elif op == "compact":
            v = store.compact("t", target_files=1)
            # layout-only: state unchanged
        elif op == "restore":
            retained = [m["version"] for m in store.history("t")]
            target = retained[arg % len(retained)]
            state = dict(versions[target])
            v = store.restore("t", target)
        else:  # vacuum keeps last 2
            removed = store.vacuum("t", keep_last=2)
            assert removed == sorted(removed)
            if removed:
                vacuumed_below = max(vacuumed_below, removed[-1] + 1)
            v = store.latest_version("t")
        versions[v] = dict(state)

        # invariant: the LATEST state always equals the model
        got = {
            r["id"]: (r["val"], r["is_deleted"])
            for r in store.read("t").collect()
        }
        assert got == versions[store.latest_version("t")], (op, arg)

    # time travel: every retained version equals its recorded model state
    for m in store.history("t"):
        v = m["version"]
        got = {
            r["id"]: (r["val"], r["is_deleted"])
            for r in store.read("t", version=v).collect()
        }
        assert got == versions[v], f"version {v} diverged"
        assert v >= vacuumed_below
