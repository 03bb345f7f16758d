"""Grouped linear interpolation over integer sequences (year series).

The GDP-style use case: a (group, year, value) series with interior
gaps — fill each missing year by linear interpolation between its
nearest observed neighbours; leave leading/trailing gaps NULL.

Pure window composition, zero UDFs (the op a pandas-habituated pipeline
would reach for ``applyInPandas`` to do):

1. densify: per group, explode ``sequence(min_year, max_year)``,
2. left join the observations back,
3. ``last(value, ignorenulls)`` forward + ``first(value, ignorenulls)``
   backward windows give both neighbours and their positions,
4. one arithmetic expression interpolates.

Shuffle cost: the join and windows all hash on the group key — one
exchange reused across every step.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interpolate_gaps(
    df: DataFrame,
    group_cols: Sequence[str],
    seq_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Densify each group's ``seq_col`` range and linearly interpolate
    interior NULL gaps of ``value_col``.  Returns one row per
    (group, seq) in the dense range with ``out_col`` (default:
    ``value_col``) filled; ``was_observed`` marks original rows."""
    out_col = out_col or value_col
    group_cols = list(group_cols)

    dense = (
        df.groupBy(*group_cols)
        .agg(F.min(seq_col).alias("__lo"), F.max(seq_col).alias("__hi"))
        .select(
            *group_cols,
            F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias(seq_col),
        )
    )
    obs = df.select(*group_cols, seq_col, F.col(value_col).alias("__v"))
    joined = dense.join(obs, [*group_cols, seq_col], "left")

    w_back = (
        Window.partitionBy(*group_cols)
        .orderBy(seq_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*group_cols)
        .orderBy(seq_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_v = F.last("__v", ignorenulls=True).over(w_back)
    next_v = F.first("__v", ignorenulls=True).over(w_fwd)
    prev_s = F.last(
        F.when(F.col("__v").isNotNull(), F.col(seq_col)), ignorenulls=True
    ).over(w_back)
    next_s = F.first(
        F.when(F.col("__v").isNotNull(), F.col(seq_col)), ignorenulls=True
    ).over(w_fwd)

    interpolated = F.when(F.col("__v").isNotNull(), F.col("__v")).otherwise(
        prev_v
        + (next_v - prev_v)
        * (F.col(seq_col) - prev_s)
        / (next_s - prev_s)
    )
    return joined.select(
        *group_cols,
        seq_col,
        interpolated.alias(out_col),
        F.col("__v").isNotNull().alias("was_observed"),
    )
