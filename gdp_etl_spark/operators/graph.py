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

Determinism has two tiers:

* default (float) — double addition order inside a hash agg is not
  guaranteed, so ranks agree across runs to ~1e-15 relative, not
  bitwise; the unit test pins values against a NumPy power iteration.
* ``quantize_scale=10**12`` — every iteration's rank vector is an exact
  bigint at the given fixed-point scale: per-edge contributions use
  integer division, the damping factor is applied as an exact integer
  ratio, and sums are bigint.  Bit-identical across runs, partitionings
  AND engines — an unrolled integer-arithmetic SQL replay (DuckDB
  oracle) reproduces every rank exactly, upgrading the driver check
  from rows-only to full hash equality.  The quantization bias per
  iteration is < ``iterations × n_nodes / scale`` of total mass
  (≪ 1e-6 at the default scale), far below float tier's own run-to-run
  wobble in what it *guarantees*.
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
    quantize_scale: int | None = None,
) -> DataFrame:
    """(node, rank) after ``iterations`` of damped power iteration.

    ``edges`` is a directed edge list; parallel edges count once.
    Ranks sum to ~1 (dangling-node mass is redistributed uniformly via
    per-iteration renormalization).

    With ``quantize_scale`` set (e.g. ``10**12``) the whole iteration
    runs in exact bigint fixed-point (see module docstring): ``damping``
    must then be expressible as a percentage (``damping*100`` integral).
    """
    if quantize_scale is not None:
        return _pagerank_quantized(
            edges, src_col, dst_col, iterations, damping, quantize_scale
        )
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


def _pagerank_quantized(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iterations: int,
    damping: float,
    scale: int,
) -> DataFrame:
    """Exact-bigint power iteration (see module docstring).

    Every rank is an integer multiple of ``1/scale``:

    * ``r0 = scale div n``
    * per-edge contribution = ``rank div out_deg`` (bigint div)
    * ``r' = teleport + (dp·(Σ contrib + dangling div n)) div 100``,
      ``teleport = ((100−dp)·scale div 100) div n``, ``dp = damping·100``

    All operands stay < 100·scale < 2⁶³ for scale ≤ 10¹⁶.  Returns
    (node, rank_q bigint, rank double = rank_q/scale) — both columns
    bit-reproducible across engines.
    """
    dp = int(round(damping * 100))
    if abs(damping * 100 - dp) > 1e-9:
        raise ValueError(
            f"quantized pagerank needs damping expressible in percent, got {damping}"
        )
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
        return nodes.select(
            "node", F.lit(0).cast("bigint").alias("rank_q"),
            F.lit(0.0).alias("rank"),
        )

    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    e_deg = e.join(out_deg, "src").repartition("src").persist()
    e_deg.count()

    teleport = ((100 - dp) * scale // 100) // n_nodes
    ranks = nodes.select(
        "node", F.lit(scale // n_nodes).cast("bigint").alias("rank_q")
    ).localCheckpoint(eager=True)
    dangling_nodes = nodes.join(
        out_deg.withColumnRenamed("src", "node"), "node", "left_anti"
    ).localCheckpoint(eager=True)

    for _ in range(iterations):
        contrib = (
            e_deg.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("rank_q div out_deg")).alias("in_q"))
        )
        dangling_mass = dangling_nodes.join(ranks, "node").agg(
            F.coalesce(F.sum("rank_q"), F.lit(0)).cast("bigint").alias("__dq")
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling_mass))
            .select(
                "node",
                (
                    F.lit(teleport).cast("bigint")
                    + F.expr(
                        f"({dp} * (coalesce(in_q, CAST(0 AS BIGINT))"
                        f" + (__dq div {n_nodes}))) div 100"
                    )
                ).alias("rank_q"),
            )
            .localCheckpoint(eager=True)
        )

    e_deg.unpersist()
    return ranks.select(
        "node", "rank_q", (F.col("rank_q") / F.lit(float(scale))).alias("rank")
    )


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact per-vertex triangle counts via degree-ordered edge
    orientation — the join-based algorithm that survives skew.

    A naive triangle join (edges³ on shared endpoints) explodes on hub
    nodes: a degree-d vertex generates d² wedge candidates.  Orienting
    every undirected edge from its lower-(degree, id) endpoint to the
    higher one makes the oriented out-degree O(√m) regardless of how
    skewed the raw degrees are [Cohen 2009, "Graph Twiddling in a
    MapReduce World"], so wedge generation is bounded by m^1.5 total
    and no single key dominates a shuffle.  The orientation order is a
    DAG, so each triangle is generated exactly once (at its smallest
    endpoint) and closed by one semi-equi-join against the oriented
    edge set — three shuffles total, no cartesian anywhere.

    Per-vertex counts are orientation-independent (each triangle
    credits all three corners), so a plain id-ordered SQL replay is a
    valid oracle even though the engine orders by degree.

    Input may contain duplicates, self-loops, or both directions of an
    edge; all are canonicalized away.  Output: ``(vertex, n_triangles)``
    for every vertex that closes at least one triangle.
    """
    a, b = F.col(src), F.col(dst)
    und = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient each edge toward the larger (deg, id) endpoint
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("w"),
        )
    )
    # wedges at u: pairs of out-neighbours (v1 < v2 dedupes the pair)
    o1 = oriented.select(F.col("u"), F.col("w").alias("v1"))
    o2 = oriented.select(F.col("u"), F.col("w").alias("v2"))
    wedges = o1.join(o2, "u").filter(F.col("v1") < F.col("v2"))
    # close the wedge: the third edge appears in EITHER orientation
    close = oriented.select(
        F.least("u", "w").alias("v1"), F.greatest("u", "w").alias("v2")
    )
    triangles = wedges.join(close, ["v1", "v2"], "left_semi")
    corners = (
        triangles.select(F.col("u").alias("vertex"))
        .unionAll(triangles.select(F.col("v1").alias("vertex")))
        .unionAll(triangles.select(F.col("v2").alias("vertex")))
    )
    return corners.groupBy("vertex").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
