"""Transitive closure over an edge list (SURVEY.md §2.3 J7).

The reference's ``expand_hierarchy`` (``gpd_etl_pipeline.R:347-388``)
repeatedly replaces each child by that child's children until only leaf
rows remain — a recursive self-join expressible two ways on Spark 4:

* **this module's iterative loop** — the scale path: depth is bounded
  (``max_iterations``), every pass checkpoints (constant-size plans),
  the convergence probe is driver-side and near-free, and each pass is
  one BROADCAST join (no shuffle at all for dimension-sized edges);
* **``WITH RECURSIVE`` SQL** — one declarative statement, right for
  ad-hoc queries on dimension-sized graphs where a few uncapped
  shuffle iterations are affordable; but each recursion step is a full
  shuffle join with no driver-side convergence cap or lineage
  truncation, so it is NOT the 100-TB path.

``tests/test_golden_reference.py::test_recursive_cte_closure_parity``
pins that both forms (and both of this module's execution paths)
produce identical closures on the reference's real 2,194-edge
hierarchy.

Design: a driver-side loop of *broadcast* self-joins.

* The frontier (rows still expandable) is tiny relative to the fact —
  hierarchy edge lists are dimension-sized — so each iteration joins the
  current closure against a broadcast of the raw edges: no shuffle at all.
* ``localCheckpoint`` per iteration truncates lineage; without it the
  plan doubles every pass and analysis time dominates by depth ~10.
* Termination = left-semi join (cheapest existence test) between current
  child codes and parent codes; depth is bounded by the hierarchy's
  longest path (the reference data needs ≤5 passes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _closure_driver_side(
    pairs: list[tuple], parent_col: str, child_col: str
) -> list[tuple]:
    """Exact replace-until-leaf closure in plain Python (memoized DFS
    with cycle detection) — identical semantics to the distributed loop."""
    from collections import defaultdict

    children = defaultdict(list)
    for p, c in pairs:
        children[p].append(c)
    memo: dict = {}
    WHITE, GRAY, BLACK = 0, 1, 2
    color: dict = defaultdict(int)

    def leaves(node):
        if node in memo:
            return memo[node]
        if color[node] == GRAY:
            raise RuntimeError("closure did not converge (cycle?)")
        if node not in children:
            return frozenset([node])
        color[node] = GRAY
        acc = set()
        for c in children[node]:
            acc |= leaves(c)
        color[node] = BLACK
        memo[node] = frozenset(acc)
        return memo[node]

    out = set()
    for p in children:
        for leaf in leaves(p):
            out.add((p, leaf))
    return sorted(out)


def transitive_closure(
    edges: DataFrame,
    parent_col: str = "parent",
    child_col: str = "child",
    max_iterations: int = 50,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Expand (parent, child) edges to (ancestor, descendant) pairs where
    every descendant is a *leaf* (never itself a parent), mirroring the
    reference's replace-until-leaf semantics.  Returns distinct pairs with
    the original column names.

    Hierarchy edge lists are metadata — dimension-sized, kilobytes — so
    below ``driver_threshold`` rows the closure runs driver-side (one
    collect, memoized DFS, one createDataFrame) instead of paying N
    Spark jobs of pure scheduling overhead; the iterative distributed
    loop below remains the path for genuinely large graphs
    (``driver_threshold=0`` forces it).  Both paths share exact
    semantics, including the cycle error; tests cover both.

    Per-iteration cost discipline: the edge list is
    ``localCheckpoint``-ed ONCE up front (otherwise every broadcast
    rebuilds its upstream plan — scans, unions — each pass), and each
    pass is ONE broadcast left join where matched rows fan out to their
    children and unmatched rows keep their leaf (``coalesce``), with a
    match marker carried through the same checkpoint.  One checkpoint
    job + one cached-count probe per iteration — no separate semi-join
    pass."""
    if driver_threshold:
        head = edges.select(parent_col, child_col).limit(driver_threshold + 1).collect()
        if len(head) <= driver_threshold:
            pairs = _closure_driver_side(
                [(r[0], r[1]) for r in head], parent_col, child_col
            )
            from gdp_etl_spark.session import local_df

            return local_df(
                edges.sparkSession, pairs,
                edges.select(parent_col, child_col).schema,
            )

    raw = edges.select(
        F.col(parent_col).alias("__ep"), F.col(child_col).alias("__ec")
    ).localCheckpoint(eager=True)
    cur = raw.select(F.col("__ep").alias("A"), F.col("__ec").alias("D"))

    for _ in range(max_iterations):
        annotated = (
            cur.join(F.broadcast(raw), cur["D"] == raw["__ep"], "left")
            .select(
                "A",
                F.coalesce(F.col("__ec"), F.col("D")).alias("D"),
                F.col("__ep").isNotNull().alias("__expanded"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        cur = annotated.select("A", "D")
        # probe runs on the already-materialized checkpoint — near-free
        if annotated.filter(F.col("__expanded")).limit(1).count() == 0:
            break
    else:
        raise RuntimeError(f"closure did not converge in {max_iterations} iterations (cycle?)")

    return cur.select(F.col("A").alias(parent_col), F.col("D").alias(child_col)).distinct()


def closure_all_pairs(
    edges: DataFrame,
    parent_col: str = "parent",
    child_col: str = "child",
    max_iterations: int = 50,
) -> DataFrame:
    """Full ancestor→descendant closure (descendants at *every* level, not
    just leaves) — the standard semantics a recursive CTE would give."""
    raw = edges.select(
        F.col(parent_col).alias("__ep"), F.col(child_col).alias("__ec")
    ).localCheckpoint(eager=True)
    cur = raw.select(F.col("__ep").alias("A"), F.col("__ec").alias("D")).distinct()
    frontier = cur
    for _ in range(max_iterations):
        nxt = (
            frontier.join(F.broadcast(raw), frontier["D"] == raw["__ep"], "inner")
            .select(F.col("A"), F.col("__ec").alias("D"))
            .distinct()
            .join(cur, ["A", "D"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        cur = cur.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    else:
        raise RuntimeError(f"closure did not converge in {max_iterations} iterations (cycle?)")
    return cur.select(F.col("A").alias(parent_col), F.col("D").alias(child_col))


def rollup_hierarchy(
    fact: DataFrame,
    closure: DataFrame,
    fact_key: str,
    closure_parent: str,
    closure_child: str,
    group_keys: list[str],
    value_col: str,
) -> DataFrame:
    """J8 + A2 (reference ``gpd_etl_pipeline.R:393-399``): fan the fact out
    over group membership and sum per (ancestor, group_keys).  The
    closure is dimension-sized → broadcast; the only shuffle is the final
    aggregation, with map-side partial aggregation for free.

    R ``sum(na.rm=TRUE)`` yields 0 for all-NA groups, so the sum is
    coalesced to 0 (SURVEY.md §2.4 A1 semantic gap)."""
    joined = fact.join(
        F.broadcast(closure), fact[fact_key] == closure[closure_child], "inner"
    )
    return (
        joined.groupBy(closure_parent, *group_keys)
        .agg(F.coalesce(F.sum(value_col), F.lit(0.0)).alias(value_col))
    )
