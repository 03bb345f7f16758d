"""Table profiling: per-column null counts and cardinality in ONE pass.

The observability primitive every pipeline run wants (schema drift,
null explosions, key-cardinality checks) expressed Spark-first: a
single wide aggregation row — count / null-count / distinct-count per
column, all computed in one scan — unpivoted to a (column, metric)
long table.  Distinct counts use exact ``count_distinct`` so the
result is oracle-checkable; swap ``approx_count_distinct`` at the
call site when 2% error is acceptable and the expand-for-distinct
shuffle is not.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, null_frac, n_distinct) per column.

    ``n_distinct`` counts non-NULL distincts (SQL ``COUNT(DISTINCT c)``
    semantics in both engines)."""
    cols = list(cols or df.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            (F.col(f"__nulls_{c}").cast("double") / F.col("__n"))
            .alias("null_frac"),
            F.col(f"__nd_{c}").alias("n_distinct"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


def equiwidth_histogram(
    df: DataFrame, col: str, nbins: int = 20
) -> DataFrame:
    """Equi-width histogram of a numeric column: (bin, lo, hi, n).

    Two-pass but one-scan-each: a global min/max agg (tiny, broadcast
    back as a literal-free cross join), then one hash agg on the bin
    id.  Bin math is plain binary64 arithmetic — ``floor((x-min)/w)``
    clamped to the last bin — so any IEEE-754 engine reproduces it
    bit-for-bit (oracle-checkable).  Empty bins are emitted with n=0
    via a distributed ``sequence`` explode, not a driver loop.
    NULLs are excluded.
    """
    x = F.col(col)
    bounds = df.agg(
        F.min(x).cast("double").alias("__lo"), F.max(x).cast("double").alias("__hi")
    )
    counted = (
        df.filter(x.isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.lit(nbins - 1),
                F.floor(
                    (x.cast("double") - F.col("__lo"))
                    / ((F.col("__hi") - F.col("__lo")) / F.lit(float(nbins)))
                ),
            )
            .cast("int")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid = bounds.select(
        F.explode(F.sequence(F.lit(0), F.lit(nbins - 1))).alias("bin"),
        "__lo",
        "__hi",
    )
    w = (F.col("__hi") - F.col("__lo")) / F.lit(float(nbins))
    return (
        grid.join(counted, "bin", "left")
        .select(
            "bin",
            (F.col("__lo") + F.col("bin") * w).alias("lo"),
            (F.col("__lo") + (F.col("bin") + 1) * w).alias("hi"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
        .orderBy("bin")
    )
