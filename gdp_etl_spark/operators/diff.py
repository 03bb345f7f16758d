"""Release-diff operators (SURVEY.md §2.3 J6, §2.2 F3/F4, §3.2).

The reference's QA methodology is a full-outer join of the new release
against the previous one, then null-pattern and tolerance predicates
(``gdp_compare_with_old_data.R:38-44``; ``04…07-*.Rmd``).  At scale both
sides are big → this is a sort-merge join on the natural key; no
broadcast hint on purpose.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def full_outer_diff(
    new: DataFrame,
    old: DataFrame,
    keys: Sequence[str],
    value_col: str,
    new_suffix: str = "_new",
    old_suffix: str = "_old",
) -> DataFrame:
    """new ⋈⟗ old on ``keys`` with suffixed value columns — the J6 diff
    table every QA query derives from."""
    n = new.select(*keys, F.col(value_col).alias(f"{value_col}{new_suffix}"))
    o = old.select(*keys, F.col(value_col).alias(f"{value_col}{old_suffix}"))
    return n.join(o, list(keys), "full")


def classify_diff(
    diff: DataFrame,
    value_col: str,
    tol: float,
    new_suffix: str = "_new",
    old_suffix: str = "_old",
    out_col: str = "status",
) -> DataFrame:
    """F3/F4 audit classification: missing (old-only), added (new-only),
    changed (|Δ| > tol), unchanged.  Tolerance mirrors the reference's
    accepted rounding noise (``near(tol=2)``,
    ``04-discrepancies-before-last-year.Rmd:97``)."""
    nv, ov = F.col(f"{value_col}{new_suffix}"), F.col(f"{value_col}{old_suffix}")
    return diff.withColumn(
        out_col,
        F.when(nv.isNull() & ov.isNotNull(), F.lit("missing"))
        .when(nv.isNotNull() & ov.isNull(), F.lit("added"))
        .when(F.abs(nv - ov) > tol, F.lit("changed"))
        .otherwise(F.lit("unchanged")),
    )
