"""PageRank by distributed power iteration.

The canonical iterative-algorithm shape on Spark, complementing the
transitive closure (``closure.py``) and connected components
(``cluster.py``): a rank vector keyed by node, refined by K joins
against the edge list.  Use cases in a curation pipeline: scoring a
citation / hyperlink graph to weight documents, or ranking entities in
a co-occurrence graph.

Spark-first design, engineered for the 100-TB shape:

* The edge list is the big, *static* side — it is partitioned by ``src``
  once up front and cached, so every iteration's join co-locates with
  the rank vector's hash partitioning and AQE reuses the layout instead
  of re-shuffling the edges K times.
* Each iteration is exactly one shuffle (the groupBy on ``dst``); the
  join itself is shuffle-free on the edge side.
* Lineage is cut with ``localCheckpoint`` every iteration — K chained
  shuffles would otherwise build a plan Catalyst re-analyzes
  quadratically (same pattern as the closure operator).
* Dangling nodes (no out-edges) leak rank mass by construction; the
  teleport term re-normalizes per iteration with a single scalar agg,
  keeping ``sum(rank) == 1`` without an extra join.

Deterministic given a fixed iteration count (double addition order
inside a hash agg is not guaranteed, so ranks agree across runs to
~1e-15 relative, not bitwise — the driver records a rows-only check,
and the unit test pins values against a NumPy power iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after ``iterations`` of damped power iteration.

    ``edges`` is a directed edge list; parallel edges count once.
    Ranks sum to 1 (dangling-node mass is redistributed uniformly via
    per-iteration renormalization).
    """
    spark = edges.sparkSession
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # static join side: edges annotated with out-degree, hash-partitioned
    # on src once and cached — reused by every iteration's join
    e_deg = (
        e.join(out_deg, "src")
        .repartition("src")
        .persist()
    )
    e_deg.count()  # materialize before the loop

    ranks = nodes.select(
        "node", F.lit(1.0 / n_nodes).alias("rank")
    ).localCheckpoint(eager=True)

    dangling_nodes = nodes.join(
        out_deg.withColumnRenamed("src", "node"), "node", "left_anti"
    ).localCheckpoint(eager=True)

    for _ in range(iterations):
        contrib = (
            e_deg.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("in_rank"))
        )
        # rank mass sitting on dangling nodes is redistributed uniformly
        # (textbook treatment).  Kept lazy as a 1-row broadcast cross
        # join so each iteration is ONE job (the eager checkpoint), not
        # a scalar-collect job plus a checkpoint job.
        dangling_mass = dangling_nodes.join(ranks, "node").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dangling")
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling_mass))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (
                        F.coalesce("in_rank", F.lit(0.0))
                        + F.col("__dangling") / F.lit(float(n_nodes))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )

    e_deg.unpersist()
    return ranks
