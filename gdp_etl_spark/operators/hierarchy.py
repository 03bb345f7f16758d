"""Reference-exact hierarchy expansion (SURVEY.md §2.3 J7/J8).

The reference's ``expand_hierarchy`` (``gpd_etl_pipeline.R:347-388``) is
NOT a plain leaf closure: each pass self-joins the *current* frame on
``Child_Code == Parent_Code``, replaces the five child fields by the
matched row's child fields (field-wise ``ifelse(is.na(new), old, new)``),
and then keeps only rows where

* the (updated) ``Child_IsTarget == "True"``, or
* the row was expanded this pass (``!is.na(Child_Code.new)``), or
* ``Parent_Label == "Other territories"``

(``:385``) — so non-target leaf children ("… n.e.s." codes) are dropped
*except* under "Other territories", and — a load-bearing quirk — a
non-target leaf reached in the FINAL pass survives, because the
recursion terminates by checking expandability *before* filtering
(``:349-357``).  On the real ``Dim_Countries_Hierarchy_All.csv`` this
keeps 18 non-target children (7 under World, 5 under Developing
economies, 6 under Other territories) that a clean "targets only"
closure would drop; the published group aggregates include them, so
golden parity requires the exact semantics, duplicates preserved
(the reference applies no ``distinct``; the real data happens to
produce none).

:func:`transitive_closure` (``closure.py``) remains the generic
leaf-closure operator for plain edge lists; this module exists for
frames that carry the reference's full 10-column hierarchy contract.

Scale shape: hierarchy frames are dimension-sized metadata.  Below
``driver_threshold`` rows the loop runs driver-side (one collect, exact
Python mirror of the R recursion, one Arrow ``local_df`` back); the
distributed loop is one broadcast left self-join + filter per level
with ``localCheckpoint`` lineage truncation, same cost discipline as
``transitive_closure``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the five child-side fields the reference replaces per expansion pass
CHILD_FIELDS = [
    "Child_Code",
    "Child_Label",
    "Child_ValidFrom",
    "Child_ValidTo",
    "Child_IsTarget",
]

#: parent-side fields (never modified by expansion)
PARENT_FIELDS = [
    "Parent_Code",
    "Parent_Label",
    "Parent_ValidFrom",
    "Parent_ValidTo",
    "Parent_IsTarget",
]

#: the parent-label exemption from the target-leaf filter
#: (``gpd_etl_pipeline.R:385``)
OTHER_TERRITORIES = "Other territories"


def _expand_rows_driver(
    rows: list[dict], max_iterations: int = 50
) -> list[dict]:
    """Exact Python mirror of the R recursion over collected rows.
    ``None`` models R's NA (field-wise keep-old on NA replacement).
    Bounded: a cyclic hierarchy would otherwise loop forever (the
    reference would blow R's recursion stack on the same input)."""
    from collections import defaultdict

    for _ in range(max_iterations):
        by_parent: dict = defaultdict(list)
        for r in rows:
            by_parent[r["Parent_Code"]].append(r)
        if not any(r["Child_Code"] in by_parent for r in rows):
            return rows
        out = []
        for x in rows:
            ys = by_parent.get(x["Child_Code"])
            if ys:
                for y in ys:
                    nr = dict(x)
                    for f in CHILD_FIELDS:
                        if y[f] is not None:
                            nr[f] = y[f]
                    # Child_Code.new is y's Child_Code; non-None marks
                    # the row as expanded this pass
                    nr["__expanded"] = y["Child_Code"] is not None
                    out.append(nr)
            else:
                nr = dict(x)
                nr["__expanded"] = False
                out.append(nr)
        rows = [
            r
            for r in out
            if r["Child_IsTarget"] == "True"
            or r["__expanded"]
            or r["Parent_Label"] == OTHER_TERRITORIES
        ]
        for r in rows:
            del r["__expanded"]
    raise RuntimeError(
        f"expand_hierarchy did not converge in {max_iterations} "
        f"iterations (cycle?)"
    )


def expand_hierarchy(
    hierarchy: DataFrame,
    max_iterations: int = 50,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Expand a 10-column reference hierarchy frame to its (ancestor,
    resolved-child) rows with the reference's exact replace-and-filter
    semantics (see module docstring).  Requires the columns in
    :data:`PARENT_FIELDS` + :data:`CHILD_FIELDS`; extra columns are
    dropped.  Returns the same 10 columns; duplicates (multiple paths
    to one leaf) are preserved exactly as the reference preserves them.
    """
    cols = PARENT_FIELDS + CHILD_FIELDS
    missing = [c for c in cols if c not in hierarchy.columns]
    if missing:
        raise ValueError(
            f"expand_hierarchy needs the reference hierarchy contract; "
            f"missing columns: {missing}"
        )
    src = hierarchy.select(*cols)

    if driver_threshold:
        head = src.limit(driver_threshold + 1).collect()
        if len(head) <= driver_threshold:
            rows = _expand_rows_driver(
                [r.asDict() for r in head], max_iterations
            )
            from gdp_etl_spark.session import local_df

            return local_df(
                src.sparkSession,
                [tuple(r[c] for c in cols) for r in rows],
                src.schema,
            )

    cur = src.localCheckpoint(eager=True)
    for _ in range(max_iterations):
        # rename before the self-semi-join: Spark's ambiguous-self-join
        # check (rightly) rejects cur⋈cur on same-named lineage.
        # eqNullSafe, not ==: R's %in% and dplyr's default
        # na_matches="na" treat NA as matching NA (a blank cell in the
        # CSV), and the driver-side dict-lookup mirror does too — a
        # null-rejecting join would silently diverge between paths.
        parents = cur.select(F.col("Parent_Code").alias("__pp")).distinct()
        expandable = (
            cur.join(
                parents,
                cur["Child_Code"].eqNullSafe(parents["__pp"]),
                "left_semi",
            )
            .limit(1)
            .count()
        )
        if expandable == 0:
            return cur
        rhs = cur.select(
            F.col("Parent_Code").alias("__k"),
            *[F.col(f).alias(f"__new_{f}") for f in CHILD_FIELDS],
        )
        joined = cur.join(
            F.broadcast(rhs), cur["Child_Code"].eqNullSafe(F.col("__k")), "left"
        )
        keep = (
            (F.coalesce(F.col("__new_Child_IsTarget"),
                        F.col("Child_IsTarget")) == "True")
            | F.col("__new_Child_Code").isNotNull()
            | (F.col("Parent_Label") == OTHER_TERRITORIES)
        )
        cur = (
            joined.filter(keep)
            .select(
                *PARENT_FIELDS,
                *[
                    F.coalesce(F.col(f"__new_{f}"), F.col(f)).alias(f)
                    for f in CHILD_FIELDS
                ],
            )
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"expand_hierarchy did not converge in {max_iterations} "
        f"iterations (cycle?)"
    )


def reference_rollup(
    fact: DataFrame,
    hierarchy: DataFrame,
    code_col: str = "Economy_Code",
    group_keys: tuple[str, ...] = ("Year", "Variable"),
    value_col: str = "Value",
    world_code: str = "0000",
) -> DataFrame:
    """The reference's ``compute_aggregate_values`` group branch
    (``gpd_etl_pipeline.R:390-413``): expand the hierarchy, fan the fact
    out over resolved membership, sum per (parent, *group_keys*) with R
    ``na.rm=TRUE`` semantics (all-NA → 0), drop parents that matched no
    fact row (the reference's ``filter(!is.na(Year))`` after its left
    join ≡ inner join here, plus an explicit NULL drop on the FIRST
    group key, which plays the reference's Year), and give "World"
    code ``world_code``
    (the reference re-pads it because base-R ``read.csv`` +
    ``as.character`` strips Parent_Code's leading zeros, ``:404-407``).

    Returns group rows only — union onto the fact for the reference's
    full frame.  The expanded membership is dimension-sized and
    broadcast; the single shuffle is the aggregation."""
    from ..functions.expressions import sum_na_zero

    pairs = expand_hierarchy(hierarchy).select(
        "Parent_Code", "Parent_Label", "Child_Code"
    )
    fanned = fact.join(
        F.broadcast(pairs), fact[code_col] == pairs["Child_Code"], "inner"
    )
    # the reference's filter(!is.na(Year)) (:410) does double duty: it
    # drops parents its left join matched to nothing (our inner join
    # covers that) AND fact rows whose own Year is NULL — replicate the
    # second half so a NULL-Year fact row cannot mint a NULL-Year group
    first_key = group_keys[0]
    return (
        fanned.groupBy("Parent_Code", "Parent_Label", *group_keys)
        .agg(sum_na_zero(value_col).alias(value_col))
        .filter(F.col(first_key).isNotNull())
        .select(
            F.when(F.col("Parent_Label") == "World", F.lit(world_code))
            .otherwise(F.col("Parent_Code"))
            .alias(code_col),
            F.col("Parent_Label").alias("Economy_Label"),
            *group_keys,
            value_col,
        )
    )
