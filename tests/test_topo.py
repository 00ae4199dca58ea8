"""Topo-sort semantics parity (`/root/reference/scripts/03_cdc_etl.py:174-201`):
DAG ordering, cycle leftovers appended, disconnected nodes, determinism."""

from oracle_to_oracle_data_integration_pipeline_spark.plans.topo import topo_depths, topo_sort_tables

FIXTURE_TABLES = sorted(
    ["region", "nation", "customer", "supplier", "part", "orders", "lineitem",
     "events", "documents", "embeddings"]
)
FIXTURE_EDGES = [
    ("region", "nation"), ("nation", "customer"), ("nation", "supplier"),
    ("customer", "orders"), ("orders", "lineitem"), ("part", "lineitem"),
    ("supplier", "lineitem"),
]


def test_dag_order_parents_first():
    ordered, leftovers = topo_sort_tables(FIXTURE_TABLES, FIXTURE_EDGES)
    assert leftovers == []
    pos = {t: i for i, t in enumerate(ordered)}
    for p, c in FIXTURE_EDGES:
        assert pos[p] < pos[c], (p, c)


def test_deterministic_lexicographic():
    ordered, _ = topo_sort_tables(FIXTURE_TABLES, FIXTURE_EDGES)
    assert ordered == [
        "documents", "embeddings", "events", "part", "region",
        "nation", "customer", "orders", "supplier", "lineitem",
    ]


def test_cycle_leftovers_appended():
    tables = ["a", "b", "c", "d"]
    edges = [("a", "b"), ("b", "c"), ("c", "b"), ("a", "d")]
    ordered, leftovers = topo_sort_tables(tables, edges)
    assert ordered == ["a", "d"]
    assert leftovers == ["b", "c"]  # cycle members, input order


def test_disconnected_nodes():
    ordered, leftovers = topo_sort_tables(["x", "y"], [])
    assert ordered == ["x", "y"] and leftovers == []


def test_self_edge_ignored():
    ordered, leftovers = topo_sort_tables(["a"], [("a", "a")])
    assert ordered == ["a"] and leftovers == []


def test_edges_outside_table_set_ignored():
    """Reference restricts FK discovery to the discovered set
    (`/root/reference/utils/database.py:107-108`)."""
    ordered, leftovers = topo_sort_tables(["a", "b"], [("z", "a"), ("a", "b")])
    assert ordered == ["a", "b"] and leftovers == []


def test_depths_enable_parallel_waves():
    d = topo_depths(FIXTURE_TABLES, FIXTURE_EDGES)
    assert d["region"] == 0 and d["part"] == 0
    assert d["nation"] == 1
    assert d["customer"] == 2 and d["supplier"] == 2
    assert d["orders"] == 3
    assert d["lineitem"] == 4
