"""Distributed deterministic k-means over embedding columns.

The missing piece between the ANN family (similarity.py — which trains
its IVF centroids driver-side on a small *sample*) and corpus curation:
cluster the FULL embedding table distributed, e.g. to balance training
data across semantic domains, pick diverse exemplars, or build coarse
IVF cells from all points instead of a sample.

Spark-first shape (the classic scalable Lloyd's layout, same as
Spark ML's KMeans but engine-deterministic):

* **assignment is map work** — centroids (k·d numbers, tiny) ride into
  the executors as one literal nested-array expression; each row finds
  its argmin cell with a single nested higher-order function (one
  ``transform`` over centroids around one ``zip_with``/``aggregate``
  dot — compact whole-stage codegen, no UDF, no join, no shuffle).
* **update is one bounded shuffle** — ``groupBy(cluster)`` with ``d``
  per-dimension integer ``sum`` aggregates (map-side partial combine),
  producing exactly ``k`` rows that are collected to the driver
  (k·d ≪ memory; the same treeAggregate-to-driver pattern Spark ML
  uses).  Per iteration: one shuffle of k rows, nothing else moves.

Determinism & oracle portability (the repo's fixed-point recipe —
cf. functions/vectors.py:dot_fixed, graph.py:pagerank exact tier):

* elements are quantized once to non-negative BIGINT
  ``floor((x + offset) · scale)`` — the shared +offset cancels in every
  squared distance, and non-negativity makes floor-division equal to
  truncating division, so Spark's ``div`` and DuckDB's ``//`` agree;
* distances are exact integer sums of squared differences;
* centroid updates are integer floor-divisions of per-dim sums;
* seeds are the ``k`` rows with the smallest ``md5(id:seed)`` prefix
  (the sampling.py hash-bucket), cluster ids assigned in hash order;
* ties (equal distance) resolve to the smallest cluster id.

Every step is therefore bit-reproducible across engines, partitionings
and cluster sizes, and a DuckDB oracle can replay the full iteration
history as unrolled CTEs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _quantize(vec: Column, scale: float, offset: float) -> Column:
    """Non-negative fixed-point: floor((x + offset) * scale) as bigint."""
    return F.transform(
        vec,
        lambda x: F.floor(
            (x.cast("double") + F.lit(float(offset))) * F.lit(float(scale))
        ).cast("bigint"),
    )


def _dist2(q: Column, cent: Column) -> Column:
    """Exact integer squared L2 distance between two bigint arrays."""
    return F.aggregate(
        F.zip_with(q, cent, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def assign_expr(
    centroids: list[list[int]], q: Column
) -> tuple[Column, Column]:
    """(cluster, dist2) argmin expressions for a quantized vector
    column against literal centroids — THE assignment shape, shared by
    the Lloyd's loop, :func:`kmeans_fixed`'s final select, and
    similarity.pq_topk's subspace encoder so the tie rule (first =
    smallest cluster id) and the HOF arity live in exactly one place.
    The transform lambda must stay ONE-argument: a second parameter —
    even a ``_s=s`` default used to bind a loop variable — makes
    PySpark pass the ARRAY INDEX to it (HOF arity is inferred from the
    signature; the pq_topk encoder shipped that bug once).

    r16: the literal matrix is built by ONE SQL parse
    (``bigint_matrix_lit``) instead of k·dim ``F.lit`` py4j calls —
    pure driver-side plan-construction cost (~0.5 ms/element) that
    every assignment-bearing query paid per build; values and the
    argmin tie rule are unchanged (the old mixed int/long literals
    coerced to bigint in the fold anyway).  A ``bind_once`` variant
    that bound the dists array per row (on the theory that
    ``array_position(dists, array_min(dists))`` pays the k·dim fold
    twice) was A/B'd interleaved across six assignment-bearing queries
    and measured par-to-slightly-SLOWER (e.g. semantic_dedup
    1.99→2.18, pq_index 5.33→5.65) — projection-level subexpression
    elimination already dedups the repeated subtree here, unlike the
    captured-operand-per-element blowups bind_once exists for;
    rejected."""
    from ..functions.expressions import bigint_matrix_lit

    cents = bigint_matrix_lit(centroids)
    dists = F.transform(cents, lambda c: _dist2(q, c))
    return (
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
        F.array_min(dists),
    )


def _quantized_frame(
    df: DataFrame, id_col: str, vec_col: str,
    scale: float, offset: float, seed: str,
) -> DataFrame:
    """(__id, __q, __h): the fixed-point frame every step reads."""
    h = F.md5(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(seed))
    )
    return df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("__id"),
        _quantize(F.col(vec_col), scale, offset).alias("__q"),
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint").alias("__h"),
    )


def _lloyd(qdf: DataFrame, k: int, n_iter: int) -> list[list[int]]:
    """Train on an already-quantized frame; returns the final centroids
    (hash-seeded, integer updates, empty clusters keep their centroid —
    the module-docstring recipe).  Shared by :func:`kmeans_fixed` and
    :func:`train_kmeans_fixed` so the PQ/IVF callers train EXACTLY the
    assignment the oracle replays."""
    seeds = qdf.orderBy("__h", "__id").limit(k).select("__q").collect()
    centroids = [list(r["__q"]) for r in seeds]
    k = len(centroids)
    if k == 0:
        return []
    dim = len(centroids[0])

    def assign() -> DataFrame:
        cluster, _ = assign_expr(centroids, F.col("__q"))
        return qdf.select("__q", cluster.alias("cluster"))

    for _ in range(n_iter):
        stats = (
            assign().groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.element_at("__q", i + 1)).alias(f"s{i}")
                  for i in range(dim)],
            )
            .collect()
        )
        for r in stats:
            c, n = r["cluster"], r["n"]
            # non-negative sums: truncating div == floor div (oracle //)
            centroids[c] = [int(r[f"s{i}"]) // n for i in range(dim)]
    return centroids


def train_pq_codebooks(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    sub: int,
    k: int = 16,
    n_iter: int = 2,
    scale: float = 1e6,
    offset: float = 1.0,
    seed: str = "pq",
) -> list[list[list[int]]]:
    """Train the ``m`` per-subspace codebooks of a product quantizer in
    ONE fused Lloyd's driver loop — bit-identical to ``m`` sequential
    :func:`train_kmeans_fixed` calls over ``slice(vec, s*sub+1, sub)``
    with seed ``f"{seed}{s}"`` (pinned in
    tests/test_kmeans_mix.py::test_train_pq_codebooks_equals_sequential),
    because every per-subspace quantity is unchanged: the seed hash is
    the same ``md5(id:seed{s})`` prefix, seeds are the k smallest
    ``(__h, __id)`` rows PER subspace, assignment is the same literal-
    centroid argmin applied per subspace, and centroid updates are the
    same per-subspace integer floor-divided sums.

    What fuses (the r15 optimization): the sequential path persists m
    sliced frames and runs m·(1 seed + n_iter update) driver actions —
    at corpus scale that is m·(n_iter+1) passes over the vector bytes;
    here ONE persisted frame holds all m quantized slices (same total
    bytes as the corpus: m rows of dim/m elements per vector) and each
    Lloyd's step is ONE action for all subspaces (seeds via a
    per-subspace rank, updates via one groupBy(subspace, cluster)),
    i.e. (n_iter+1) passes and (n_iter+1) actions regardless of m.

    Returns ``m`` codebooks (possibly with fewer than ``k`` entries
    when the corpus is smaller than ``k``; empty on an empty corpus —
    the train_kmeans_fixed contract, per subspace)."""
    from pyspark.sql import Window

    slices = []
    base = df.filter(F.col(vec_col).isNotNull())
    for s in range(m):
        h = F.md5(
            F.concat_ws(
                ":", F.col(id_col).cast("string"), F.lit(f"{seed}{s}")
            )
        )
        slices.append(
            base.select(
                F.lit(s).alias("__sub"),
                F.col(id_col).alias("__id"),
                _quantize(
                    F.slice(F.col(vec_col), s * sub + 1, sub),
                    scale, offset,
                ).alias("__q"),
                F.conv(F.substring(h, 1, 8), 16, 10)
                .cast("bigint")
                .alias("__h"),
            )
        )
    qdf = slices[0]
    for sl in slices[1:]:
        qdf = qdf.unionByName(sl)
    qdf = qdf.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # ---- seeds: the k smallest (__h, __id) rows per subspace, in
        # rank order — one action for all m subspaces
        rn = F.row_number().over(
            Window.partitionBy("__sub").orderBy("__h", "__id")
        )
        seed_rows = (
            qdf.select("__sub", "__q", rn.alias("__rn"))
            .filter(F.col("__rn") <= k)
            .collect()
        )
        books: list[list[list[int]]] = [[] for _ in range(m)]
        for r in sorted(seed_rows, key=lambda r: (r["__sub"], r["__rn"])):
            books[r["__sub"]].append(list(r["__q"]))
        if any(not b for b in books):
            # an empty corpus empties EVERY subspace (same rows); the
            # sequential path returns [] per subspace
            return books
        # ---- Lloyd's: one assignment+update action per iteration for
        # all m subspaces; per-subspace math identical to _lloyd
        for _ in range(n_iter):
            cluster = None
            for s in range(m):
                c, _d = assign_expr(books[s], F.col("__q"))
                cluster = (
                    c if cluster is None
                    else F.when(F.col("__sub") == s, c).otherwise(cluster)
                )
            stats = (
                qdf.select("__sub", "__q", cluster.alias("cluster"))
                .groupBy("__sub", "cluster")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    *[F.sum(F.element_at("__q", i + 1)).alias(f"s{i}")
                      for i in range(sub)],
                )
                .collect()
            )
            for r in stats:
                s, c, n = r["__sub"], r["cluster"], r["n"]
                # non-negative sums: truncating div == floor div
                books[s][c] = [int(r[f"s{i}"]) // n for i in range(sub)]
        return books
    finally:
        qdf.unpersist(blocking=False)


def train_kmeans_fixed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    n_iter: int = 2,
    scale: float = 1e6,
    offset: float = 1.0,
    seed: str = "km",
) -> list[list[int]]:
    """Train-only entry point: the final QUANTIZED centroids as plain
    Python ints (k·d numbers — driver-safe by construction), for
    callers that assign with their own expressions (PQ codebooks,
    IVF cells).  Same deterministic recipe as :func:`kmeans_fixed`."""
    qdf = _quantized_frame(df, id_col, vec_col, scale, offset, seed).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        return _lloyd(qdf, k, n_iter)
    finally:
        qdf.unpersist(blocking=False)


def kmeans_fixed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    n_iter: int = 2,
    scale: float = 1e6,
    offset: float = 1.0,
    seed: str = "km",
) -> DataFrame:
    """Lloyd's k-means with exact integer arithmetic; returns one row per
    input row: ``(id_col, cluster int, dist2 bigint)`` where ``dist2`` is
    the squared fixed-point distance to the final centroid.

    ``offset`` must make every quantized element non-negative (embedding
    values in [-offset, ∞) — unit-ish embeddings with the default 1.0).
    Vectors must be non-NULL with a uniform dimension (NULL rows are
    dropped up front: a NULL distance would order differently under
    Spark's NULLS FIRST vs the oracle's NULLS LAST).  Empty clusters
    keep their previous centroid.  ``k`` is capped at the row count.  Assignment plans as pure map work (literal centroids);
    each iteration's update is ONE k-row shuffle + a k·d driver collect.
    """
    # quantize once and persist: every iteration re-reads this frame
    qdf = _quantized_frame(df, id_col, vec_col, scale, offset, seed).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        centroids = _lloyd(qdf, k, n_iter)
        if not centroids:
            return df.select(
                F.col(id_col),
                F.lit(None).cast("int").alias("cluster"),
                F.lit(None).cast("bigint").alias("dist2"),
            ).limit(0)
        cluster, dist2 = assign_expr(centroids, F.col("__q"))
        return qdf.select(
            F.col("__id").alias(id_col),
            cluster.alias("cluster"),
            dist2.alias("dist2"),
        )
    finally:
        # lazily unpersist: the returned plan re-derives __q cheaply
        qdf.unpersist(blocking=False)
