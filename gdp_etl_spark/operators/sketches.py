"""Sketch-based approximate aggregates — the cardinality/quantile path
that stays cheap at 100 TB.

Exact ``count_distinct`` shuffles every distinct value; exact
percentiles sort whole groups.  Sketches (HyperLogLog++ for NDV, KLL /
Greenwald-Khanna-style for quantiles) are fixed-size mergeable state:
map-side partial sketches, one tiny merge per group, error bounded by
the sketch parameter and independent of data volume.  These wrap Spark's
built-in JVM implementations (``approx_count_distinct``,
``percentile_approx``) — no UDF, codegen-friendly.

Approximate results are engine-specific by construction (a DuckDB HLL
gives different low-order estimates), so the driver check for the demo
query is rows-only; the unit tests bound the error against exact
aggregates instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_cardinality_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group approximate NDV via HyperLogLog++ with relative standard
    deviation ``rsd``.  State is O(1/rsd²) per group regardless of group
    size — the only NDV that works on a 100-TB column."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd).alias("ndv_approx"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def group_quantile_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probabilities: Sequence[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate quantiles; rank error ≤ 1/``accuracy``.
    Mergeable fixed-size state per group (vs a full sort for exact)."""
    return df.groupBy(*group_cols).agg(
        F.percentile_approx(
            value_col, list(probabilities), accuracy
        ).alias("quantiles_approx"),
        F.count(F.lit(1)).alias("n_rows"),
    )
