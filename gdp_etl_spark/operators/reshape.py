"""Reshape operators (SURVEY.md §2.9 R1-R3, §2.7 U1).

All three are thin, explicit wrappers over native Spark: ``unpivot`` is
built-in (Spark ≥3.4), ``pivot`` takes *explicit* values to avoid the
extra distinct-scan, and by-name union mirrors R ``bind_rows`` NA-fill
semantics (reference ``gpd_etl_pipeline.R:146,130,267-270``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot(
    df: DataFrame,
    ids: Sequence[str],
    values: Sequence[str],
    var_name: str = "Variable",
    value_name: str = "Value",
) -> DataFrame:
    """Wide → long melt (reference ``gpd_etl_pipeline.R:57,63,74-78``:
    year columns → (Year, Value) rows).  Values are cast to a common type
    by Spark; callers cast the variable column (e.g. Year) afterwards."""
    return df.unpivot(list(ids), list(values), var_name, value_name)


def pivot_wide(
    df: DataFrame,
    keys: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    value_col: str,
    agg: str = "first",
) -> DataFrame:
    """Long → wide (reference ``08-deflators.Rmd:45-48``).  Explicit
    ``pivot_values`` skips Catalyst's values-discovery scan — at 100 TB
    that scan is a full extra pass."""
    aggf = {"first": F.first, "sum": F.sum, "max": F.max, "min": F.min}[agg]
    return (
        df.groupBy(*keys).pivot(pivot_col, list(pivot_values)).agg(aggf(F.col(value_col)))
    )


def union_by_name(dfs: Sequence[DataFrame]) -> DataFrame:
    """R ``bind_rows`` semantics: match columns by *name*, NULL-fill the
    missing ones (reference U1 sites).  Positional union is a silent
    corruption hazard the reference never risks; neither do we."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out
