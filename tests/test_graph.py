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


def test_grouped_linear_fit_matches_numpy(spark):
    from gdp_etl_spark.operators.regression import grouped_linear_fit

    xs = [0.0, 1.0, 2.0, 3.0, 4.0]
    ys = [1.0, 3.1, 4.9, 7.2, 8.8]
    df = spark.createDataFrame(
        [("a", x, y) for x, y in zip(xs, ys)] + [("b", 1.0, 5.0), ("b", 1.0, 7.0)],
        "g string, x double, y double",
    )
    got = {r["g"]: r for r in grouped_linear_fit(df, ["g"], "x", "y").collect()}
    slope, intercept = np.polyfit(xs, ys, 1)
    # inputs are exact at 6 decimals, so quantization is lossless here
    assert got["a"]["slope"] == pytest.approx(slope, rel=1e-9)
    assert got["a"]["intercept"] == pytest.approx(intercept, rel=1e-9)
    assert 0.99 < got["a"]["r2"] <= 1.0
    # zero x-variance group -> NULL fit
    assert got["b"]["slope"] is None and got["b"]["r2"] is None


def test_grouped_linear_fit_ignores_null_coordinates(spark):
    from gdp_etl_spark.operators.regression import grouped_linear_fit

    df = spark.createDataFrame(
        [("a", 0.0, 0.0), ("a", 1.0, 2.0), ("a", None, 99.0), ("a", 2.0, None),
         ("a", 2.0, 4.0)],
        "g string, x double, y double",
    )
    r = grouped_linear_fit(df, ["g"], "x", "y").collect()[0]
    assert r["n"] == 3
    assert r["slope"] == pytest.approx(2.0, rel=1e-9)
    assert r["intercept"] == pytest.approx(0.0, abs=1e-9)


def test_welch_ttest_matches_reference_formula(spark):
    from gdp_etl_spark.operators.regression import welch_ttest

    a = [1.0, 2.0, 3.0, 4.0, 5.0]
    b = [2.5, 3.5, 4.5, 6.5]
    df = spark.createDataFrame(
        [("A", v) for v in a] + [("B", v) for v in b] + [("C", 99.0)],
        "g string, v double",
    )
    r = welch_ttest(df, "g", "v", "A", "B").collect()[0]
    va, vb = np.var(a, ddof=1), np.var(b, ddof=1)
    se2 = va / len(a) + vb / len(b)
    t_ref = (np.mean(a) - np.mean(b)) / np.sqrt(se2)
    dof_ref = se2**2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert (r["n_a"], r["n_b"]) == (5, 4)
    assert r["t_stat"] == pytest.approx(t_ref, rel=1e-9)
    assert r["dof"] == pytest.approx(dof_ref, rel=1e-9)


def test_welch_ttest_degenerate_groups_give_null(spark):
    from gdp_etl_spark.operators.regression import welch_ttest

    df = spark.createDataFrame(
        [("A", 1.0), ("B", 2.0), ("B", 3.0)], "g string, v double"
    )
    r = welch_ttest(df, "g", "v", "A", "B").collect()[0]
    assert r["t_stat"] is None and r["dof"] is None  # n_a < 2


def test_rolling_corr_matches_numpy_per_window(spark):
    from gdp_etl_spark.operators.regression import rolling_corr

    xs = [1.0, 2.0, 4.0, 3.0, 6.0, 8.0, 7.0]
    ys = [2.0, 3.0, 5.0, 5.0, 9.0, 11.0, 12.0]
    df = spark.createDataFrame(
        [("g", i, x, y) for i, (x, y) in enumerate(zip(xs, ys))],
        "g string, t int, x double, y double",
    )
    got = {r["t"]: (r["n_window"], r["corr"])
           for r in rolling_corr(df, ["g"], "t", "x", "y", preceding=2).collect()}
    for t in range(len(xs)):
        lo = max(0, t - 2)
        wx, wy = xs[lo:t + 1], ys[lo:t + 1]
        n, c = got[t]
        assert n == len(wx)
        if len(wx) < 2:
            assert c is None
        else:
            assert c == pytest.approx(np.corrcoef(wx, wy)[0][1], rel=1e-9)


def test_rolling_corr_null_coordinate_excluded_jointly(spark):
    import math

    from gdp_etl_spark.operators.regression import rolling_corr

    # row t=2 has a NULL y: it must drop out of the count AND the sums,
    # so the frame at t=3 holds exactly the two complete points (t=1,
    # t=3) and corr is computed with a consistent n
    df = spark.createDataFrame(
        [
            ("g", 1, 1.0, 2.0),
            ("g", 2, 2.0, None),
            ("g", 3, 3.0, 6.0),
            ("g", 4, 4.0, 8.0),
        ],
        "g string, t int, x double, y double",
    )
    got = {
        r["t"]: (r["n_window"], r["corr"])
        for r in rolling_corr(df, ["g"], "t", "x", "y", preceding=9).collect()
    }
    assert got[2] == (1, None)          # lone complete point: no corr
    assert got[3][0] == 2               # NOT 3: null row excluded
    assert math.isclose(got[3][1], 1.0, rel_tol=1e-9)  # collinear pair
    assert got[4][0] == 3


def test_pagerank_quantized_matches_float_tier(spark):
    from gdp_etl_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)], "src long, dst long"
    )
    f = {r["node"]: r["rank"] for r in pagerank(edges, iterations=5).collect()}
    q = pagerank(edges, iterations=5, quantize_scale=10**12)
    qr = {r["node"]: (r["rank_q"], r["rank"]) for r in q.collect()}
    assert set(qr) == set(f)
    for node, (rank_q, rank) in qr.items():
        # quantization bias per iteration < n/scale of total mass
        assert abs(rank - f[node]) < 1e-9
        assert rank_q == int(rank * 10**12)
    # bit-identical across runs
    qr2 = {r["node"]: r["rank_q"] for r in pagerank(
        edges, iterations=5, quantize_scale=10**12).collect()}
    assert qr2 == {n: v[0] for n, v in qr.items()}


def test_pagerank_quantized_rejects_odd_damping(spark):
    import pytest

    from gdp_etl_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="percent"):
        pagerank(edges, damping=0.8567, quantize_scale=10**12)


class TestTriangleCount:
    def test_known_graph(self, spark):
        from gdp_etl_spark.operators.graph import triangle_count

        # K4 on {1,2,3,4} (4 triangles, each vertex in 3) plus a
        # pendant 4-5 (no triangle) plus noise: dup edge, reversed
        # edge, self-loop
        edges = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (2, 1), (3, 1), (3, 3)],
            "src long, dst long",
        )
        out = {r["vertex"]: r["n_triangles"]
               for r in triangle_count(edges).collect()}
        assert out == {1: 3, 2: 3, 3: 3, 4: 3}

    def test_triangle_free_bipartite(self, spark):
        from gdp_etl_spark.operators.graph import triangle_count

        edges = spark.createDataFrame(
            [(i, 100 + j) for i in range(5) for j in range(5)],
            "src long, dst long",
        )
        assert triangle_count(edges).count() == 0

    def test_matches_bruteforce_on_random_graph(self, spark):
        import itertools
        import random

        from gdp_etl_spark.operators.graph import triangle_count

        rng = random.Random(7)
        und = {tuple(sorted(rng.sample(range(30), 2))) for _ in range(150)}
        expected = {}
        for x, y, z in itertools.combinations(sorted({v for e in und for v in e}), 3):
            if (x, y) in und and (y, z) in und and (x, z) in und:
                for v in (x, y, z):
                    expected[v] = expected.get(v, 0) + 1
        edges = spark.createDataFrame(sorted(und), "src long, dst long")
        got = {r["vertex"]: r["n_triangles"]
               for r in triangle_count(edges).collect()}
        assert got == expected
