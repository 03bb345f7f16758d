"""Connected components over near-duplicate pairs → dedup clusters.

The last step of every near-dup pipeline: pair lists (from MinHash /
SimHash / cosine) imply clusters; each cluster keeps one canonical
document.  Transitivity matters — (a,b) and (b,c) must land a, b, c in
one cluster even though (a,c) was never emitted.

Algorithm: iterative min-label propagation (the classic large-graph
connected components on Spark): every node starts as its own label;
each round, every node adopts the minimum label in its neighbourhood;
converged when no label changes.  Rounds ≈ graph diameter (near-dup
clusters are tiny cliques/chains → a handful), each round one shuffle
keyed on node id, lineage cut by ``localCheckpoint`` like the closure
operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    left_col: str = "id_a",
    right_col: str = "id_b",
    max_iterations: int = 50,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; component = the
    minimum node id reachable through the pair graph.

    Graphs with ≤ ``driver_threshold`` edges take a driver-side
    union-find fast path (one collect + one createDataFrame) — near-dup
    pair graphs are tiny relative to their corpus, and the distributed
    loop's per-iteration scheduling dominates at that size (same
    rationale as the closure operator's fast path,
    ``closure.py``).  Set ``driver_threshold=0`` to force the
    distributed min-label loop (kept for genuinely large graphs and
    exercised by tests)."""
    edges = (
        pairs.select(F.col(left_col).alias("u"), F.col(right_col).alias("v"))
        .unionByName(
            pairs.select(F.col(right_col).alias("u"), F.col(left_col).alias("v"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    if driver_threshold and edges.count() <= driver_threshold:
        rows = edges.collect()
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for r_ in rows:
            u, v = r_["u"], r_["v"]
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:  # min-root union keeps component = min node id
                if rv < ru:
                    ru, rv = rv, ru
                parent[rv] = ru
        out = [(n, find(n)) for n in parent]
        from gdp_etl_spark.session import local_df

        return local_df(
            edges.sparkSession, out,
            edges.select(F.col("u").alias("node"),
                         F.col("u").alias("component")).schema,
        )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neighbour_min = (
            edges.join(labels, edges["v"] == labels["node"])
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("component").alias("__nmin"))
        )
        updated = (
            labels.join(neighbour_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("__nmin"), F.col("component"))
                ).alias("component"),
                (
                    F.coalesce(F.col("__nmin"), F.col("component"))
                    < F.col("component")
                ).alias("__changed"),
            )
            .localCheckpoint(eager=True)
        )
        labels = updated.select("node", "component")
        if updated.filter(F.col("__changed")).limit(1).count() == 0:
            break
    else:
        raise RuntimeError(
            f"components did not converge in {max_iterations} iterations"
        )
    return labels


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    left_col: str = "id_a",
    right_col: str = "id_b",
) -> DataFrame:
    """Every row of ``df`` tagged with its dedup cluster id (= min id of
    its component; singletons are their own cluster) and an
    ``is_canonical`` flag (the cluster's minimum id survives)."""
    comp = connected_components(pairs, left_col, right_col)
    out = df.join(
        comp.select(F.col("node").alias(id_col), "component"), id_col, "left"
    ).withColumn("cluster_id", F.coalesce(F.col("component"), F.col(id_col)))
    return out.drop("component").withColumn(
        "is_canonical", F.col(id_col) == F.col("cluster_id")
    )
