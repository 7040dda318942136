"""Connected-components operator tests (known graphs, convergence,
determinism)."""

from __future__ import annotations

from agf_data_ingestion_spark.operators.components import connected_components


def _cc(spark, n_vertices, edge_list):
    v = spark.createDataFrame([(i,) for i in range(n_vertices)], ["id"])
    e = spark.createDataFrame(edge_list, ["src", "dst"])
    return {
        r["id"]: r["component"]
        for r in connected_components(v, e, vertex_col="id").collect()
    }


def test_two_components_and_singletons(spark):
    # 0-1-2 chained, 3-4 pair, 5 isolated
    got = _cc(spark, 6, [(0, 1), (1, 2), (3, 4)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}


def test_long_chain_converges(spark):
    # a path graph stresses iteration count (diameter = n-1; min-label
    # propagation shortcuts as labels spread)
    n = 12
    got = _cc(spark, n, [(i, i + 1) for i in range(n - 1)])
    assert set(got.values()) == {0}


def test_direction_irrelevant(spark):
    a = _cc(spark, 4, [(0, 1), (2, 1), (3, 2)])
    b = _cc(spark, 4, [(1, 0), (1, 2), (2, 3)])
    assert a == b == {0: 0, 1: 0, 2: 0, 3: 0}
