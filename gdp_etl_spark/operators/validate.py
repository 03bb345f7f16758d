"""Declarative data-quality checks → one violations summary table.

The admission gate a production pipeline runs before publishing a
table (the reference runs its QA queries by hand as bookdown reports —
``plans.qa``; this operator is the generalized, declarative form).

Four rule kinds, each expressed as a pure DataFrame aggregation so the
whole suite is a handful of scans with map-side partial aggregation —
no collects, no UDFs:

* ``not_null(col)`` — NULL count.
* ``unique(cols)`` — rows participating in duplicate key groups.
* ``in_range(col, lo, hi)`` — non-NULL values outside [lo, hi].
* ``foreign_key(cols, dim, dim_cols)`` — child rows whose key has no
  parent (left-anti against the dim; broadcast when the dim is small).

Result schema: (rule, kind, n_violations, n_checked) — one row per
rule, so the gate is ``max(n_violations) == 0`` and the table doubles
as a monitoring time series when written per run.

Scale: not_null/in_range rules on the same table are fused into ONE
scan (single wide agg); unique and foreign_key each need their own
shuffle (group / anti-join) by nature.  The FK anti-join broadcasts
``dim`` — at 100 TB the dim side of an FK check is a dimension table,
exactly the broadcast case.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str
    cols: tuple
    lo: float | None = None
    hi: float | None = None
    dim: DataFrame | None = field(default=None, compare=False)
    dim_cols: tuple = ()


def not_null(col: str, name: str | None = None) -> Rule:
    return Rule(name or f"not_null_{col}", "not_null", (col,))


def unique(cols: Sequence[str] | str, name: str | None = None) -> Rule:
    cols = (cols,) if isinstance(cols, str) else tuple(cols)
    return Rule(name or "unique_" + "_".join(cols), "unique", cols)


def in_range(col: str, lo, hi, name: str | None = None) -> Rule:
    return Rule(name or f"range_{col}", "in_range", (col,), lo=lo, hi=hi)


def foreign_key(
    cols: Sequence[str] | str,
    dim: DataFrame,
    dim_cols: Sequence[str] | str,
    name: str | None = None,
) -> Rule:
    cols = (cols,) if isinstance(cols, str) else tuple(cols)
    dim_cols = (dim_cols,) if isinstance(dim_cols, str) else tuple(dim_cols)
    return Rule(
        name or "fk_" + "_".join(cols), "foreign_key", cols,
        dim=dim, dim_cols=dim_cols,
    )


def run_checks(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate every rule against ``df``; returns the violations
    summary (rule, kind, n_violations, n_checked), one row per rule.

    Raises ``ValueError`` for an empty rule list (nothing to report —
    and ``reduce`` over zero frames has no identity) and for duplicate
    rule names (two ``in_range`` rules on one column via default naming
    would collide on the fused ``__v_<name>`` columns and produce an
    ambiguous-column error or silently wrong counts)."""
    if not rules:
        raise ValueError("run_checks requires at least one rule")
    seen: set[str] = set()
    dups = {r.name for r in rules if r.name in seen or seen.add(r.name)}
    if dups:
        raise ValueError(
            f"duplicate rule names {sorted(dups)}; pass name=... to "
            f"disambiguate rules that share a default name"
        )
    spark = df.sparkSession
    results: list[DataFrame] = []

    # fuse all single-column scan rules into one wide aggregation
    scan_rules = [r for r in rules if r.kind in ("not_null", "in_range")]
    if scan_rules:
        aggs = [F.count(F.lit(1)).alias("__n")]
        for r in scan_rules:
            c = F.col(r.cols[0])
            if r.kind == "not_null":
                viol = F.count(F.when(c.isNull(), 1))
            else:
                viol = F.count(
                    F.when(c.isNotNull() & ((c < r.lo) | (c > r.hi)), 1)
                )
            aggs.append(viol.alias(f"__v_{r.name}"))
        wide = df.agg(*aggs)
        per_rule = [
            F.struct(
                F.lit(r.name).alias("rule"),
                F.lit(r.kind).alias("kind"),
                F.col(f"__v_{r.name}").alias("n_violations"),
                F.col("__n").alias("n_checked"),
            )
            for r in scan_rules
        ]
        results.append(
            wide.select(F.explode(F.array(*per_rule)).alias("r")).select("r.*")
        )

    for r in rules:
        if r.kind == "unique":
            dup_rows = (
                df.groupBy(*r.cols)
                .agg(F.count(F.lit(1)).alias("__c"))
                .agg(
                    F.coalesce(
                        F.sum(F.when(F.col("__c") > 1, F.col("__c"))), F.lit(0)
                    ).alias("n_violations"),
                    F.coalesce(F.sum("__c"), F.lit(0)).alias("n_checked"),
                )
            )
            results.append(
                dup_rows.select(
                    F.lit(r.name).alias("rule"),
                    F.lit("unique").alias("kind"),
                    "n_violations",
                    "n_checked",
                )
            )
        elif r.kind == "foreign_key":
            child = df.select(
                *[F.col(c).alias(d) for c, d in zip(r.cols, r.dim_cols)]
            )
            orphans = child.join(
                F.broadcast(r.dim.select(*r.dim_cols).distinct()),
                list(r.dim_cols),
                "left_anti",
            )
            results.append(
                orphans.agg(F.count(F.lit(1)).alias("n_violations")).select(
                    F.lit(r.name).alias("rule"),
                    F.lit("foreign_key").alias("kind"),
                    "n_violations",
                ).crossJoin(df.agg(F.count(F.lit(1)).alias("n_checked")))
            )

    out = reduce(DataFrame.unionByName, results)
    return out.select("rule", "kind", "n_violations", "n_checked")


def quarantine_orphans(
    df: DataFrame,
    dim: DataFrame,
    cols: Sequence[str] | str,
    dim_cols: Sequence[str] | str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split a child frame into (valid, orphans) by FK membership — the
    actionable sibling of :func:`run_checks`'s foreign_key counter:
    route the clean rows onward and the orphans to a quarantine sink
    instead of failing the whole load.

    One broadcast left-semi and one left-anti join against the same
    distinct dim projection — the dim scans once (identical subplans),
    the child is never shuffled.
    """
    cols = (cols,) if isinstance(cols, str) else tuple(cols)
    dim_cols = cols if dim_cols is None else (
        (dim_cols,) if isinstance(dim_cols, str) else tuple(dim_cols)
    )
    keys = F.broadcast(
        dim.select(
            *[F.col(d).alias(c) for c, d in zip(cols, dim_cols)]
        ).distinct()
    )
    on = list(cols)
    return df.join(keys, on, "left_semi"), df.join(keys, on, "left_anti")
