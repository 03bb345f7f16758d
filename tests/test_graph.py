"""PageRank: pinned against a NumPy power iteration of the same graph."""

import numpy as np
import pytest

from gdp_etl_spark.operators.graph import pagerank


def _numpy_pagerank(edges, n, iterations=10, d=0.85):
    """Textbook damped power iteration with uniform dangling
    redistribution — independent reference implementation."""
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        in_rank = np.zeros(n)
        for s, t in edges:
            in_rank[t] += r[s] / out_deg[s]
        dangling = r[out_deg == 0].sum()
        r = (1 - d) / n + d * (in_rank + dangling / n)
    return r


def test_pagerank_matches_numpy_power_iteration(spark):
    # 5 nodes; node 4 is dangling (no out-edges); node 2 is a hub
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 4), (2, 4)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=10).collect()}
    expect = _numpy_pagerank(edges, 5, iterations=10)
    assert set(got) == set(range(5))
    for i in range(5):
        assert got[i] == pytest.approx(expect[i], rel=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-12)


def test_pagerank_parallel_edges_count_once(spark):
    df = spark.createDataFrame(
        [(0, 1), (0, 1), (1, 0)], "src int, dst int"
    )
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=5).collect()}
    expect = _numpy_pagerank([(0, 1), (1, 0)], 2, iterations=5)
    for i in range(2):
        assert got[i] == pytest.approx(expect[i], rel=1e-12)


def test_pagerank_empty_graph(spark):
    df = spark.createDataFrame([], "src int, dst int")
    assert pagerank(df).count() == 0
