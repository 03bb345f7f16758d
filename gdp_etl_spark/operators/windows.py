"""Window / group-scoped analytics (SURVEY.md §2.5 W1-W3, §2.4 A5).

The reference's signature pattern is "broadcast a base-year value to
every row of its group" — a partitioned window with a conditional
aggregate, no self-join, no shuffle beyond the one the window already
needs.  ``gaps_and_islands`` is the classic Spark-native run-compression
(row_number difference), replacing the reference's 28-line R helper with
zero UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def base_value_broadcast(
    df: DataFrame,
    group_cols: Sequence[str],
    year_col: str,
    value_col: str,
    base_year: int,
    out_col: str = "base_value",
) -> DataFrame:
    """W1 (reference ``gpd_etl_pipeline.R:236-242,258-264``): per group,
    expose the ``base_year`` value on every row — NULL unless the group
    has *exactly one* base-year row (the reference's ``length(...)==1``
    guard).  One window over the group key; at scale this is a single
    hash-partition shuffle, reused for both the count-guard and the max.
    """
    w = Window.partitionBy(*group_cols)
    is_base = F.col(year_col) == F.lit(base_year)
    base = F.max(F.when(is_base, F.col(value_col))).over(w)
    guard = F.count(F.when(is_base, F.lit(1))).over(w)
    return df.withColumn(out_col, F.when(guard == 1, base))


def rebase_index(
    df: DataFrame,
    group_cols: Sequence[str],
    year_col: str,
    value_col: str,
    base_year: int,
    out_col: str = "index",
    scale: float = 100.0,
) -> DataFrame:
    """CPI/deflator rebase: ``scale * value / value[base_year]`` per group."""
    with_base = base_value_broadcast(df, group_cols, year_col, value_col, base_year, "__base")
    return with_base.withColumn(
        out_col, F.lit(scale) * F.col(value_col) / F.col("__base")
    ).drop("__base")


def group_extrema(
    df: DataFrame,
    group_cols: Sequence[str],
    expr: Column,
    keep: str = "max_abs",
) -> DataFrame:
    """W3 (reference ``08-deflators.Rmd:85-86``): keep each group's rows
    whose |expr| equals the group max |expr|."""
    w = Window.partitionBy(*group_cols)
    target = F.abs(expr) if keep == "max_abs" else expr
    mx = F.max(target).over(w)
    return df.withColumn("__t", target).withColumn("__mx", mx).filter(
        F.col("__t") == F.col("__mx")
    ).drop("__t", "__mx")


def gaps_and_islands(
    df: DataFrame,
    group_cols: Sequence[str],
    seq_col: str,
    out_col: str = "ranges",
) -> DataFrame:
    """A5 ``shorten_years`` (reference
    ``04-discrepancies-before-last-year.Rmd:61-83``):
    ``[1999,2000,2001,2005] → "1999-2001, 2005"``.

    Spark-native: island id = seq − row_number() over (group ORDER BY seq)
    is constant within each consecutive run; two hash aggregations later
    the runs are compressed to a display string.  Both shuffles hash on
    the group key — AQE coalesces them; no UDF, no collect.
    """
    w = Window.partitionBy(*group_cols).orderBy(seq_col)
    runs = (
        df.select(*group_cols, seq_col)
        .distinct()
        .withColumn("__island", F.col(seq_col) - F.row_number().over(w))
        .groupBy(*group_cols, "__island")
        .agg(F.min(seq_col).alias("__lo"), F.max(seq_col).alias("__hi"))
        .withColumn(
            "__range",
            F.when(F.col("__lo") == F.col("__hi"), F.col("__lo").cast("string")).otherwise(
                F.concat_ws("-", F.col("__lo").cast("string"), F.col("__hi").cast("string"))
            ),
        )
    )
    return (
        runs.groupBy(*group_cols)
        .agg(
            F.concat_ws(
                ", ", F.array_sort(F.collect_list(F.struct("__lo", "__range"))).getField("__range")
            ).alias(out_col)
        )
    )
