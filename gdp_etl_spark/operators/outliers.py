"""Distribution-based corpus filters: Tukey (IQR) outlier fences and
exact heavy hitters.

Both are the relational formulations a 100-TB pipeline wants:

* ``iqr_fences`` — one shuffle to aggregate exact quartiles per group
  (groups are few: file type, language, return flag …), fences
  broadcast back for row tagging.  Quartiles (p25/p75) interpolate at
  binary-exact fractions (k·0.25), so the fence doubles are
  bit-identical across engines — unlike p01/p99, whose (n−1)·p index
  arithmetic can differ in the last bit.
* ``heavy_hitters`` — exact support-threshold frequent items: explode →
  count per key (map-side partial agg) → keep keys with share ≥ s.
  The grouped result is vocabulary-sized, so the single-partition
  share window is safe at any corpus scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def iqr_fences(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    k: float = 1.5,
) -> DataFrame:
    """Per-group exact p25/p75, Tukey fences (p25−k·IQR, p75+k·IQR) and
    outlier counts below/above the fences."""
    v = F.col(value_col)
    bands = df.groupBy(*group_cols).agg(
        F.percentile(v, F.lit(0.25)).alias("p25"),
        F.percentile(v, F.lit(0.75)).alias("p75"),
    )
    bands = bands.withColumn(
        "lo", F.col("p25") - F.lit(k) * (F.col("p75") - F.col("p25"))
    ).withColumn("hi", F.col("p75") + F.lit(k) * (F.col("p75") - F.col("p25")))
    tagged = df.join(F.broadcast(bands), list(group_cols))
    return tagged.groupBy(*group_cols).agg(
        F.first("p25").alias("p25"),
        F.first("p75").alias("p75"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
        F.count(F.when(v < F.col("lo"), 1)).alias("n_below"),
        F.count(F.when(v > F.col("hi"), 1)).alias("n_above"),
        F.count(F.lit(1)).alias("n_total"),
    )


def heavy_hitters(
    df: DataFrame,
    item_col,
    min_share: float = 0.002,
) -> DataFrame:
    """(item, cnt, share) for items whose frequency share ≥ ``min_share``.
    ``item_col`` is a Column expression (pass an exploded token column
    or a plain key column)."""
    counts = df.select(item_col.alias("item")).groupBy("item").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # window results must be projected before they can gate a filter
    with_total = counts.withColumn(
        "__total", F.sum("cnt").over(Window.partitionBy())
    )
    return (
        with_total.withColumn(
            "share", F.col("cnt").cast("double") / F.col("__total")
        )
        .filter(F.col("cnt") >= F.lit(min_share) * F.col("__total"))
        .select("item", "cnt", "share")
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    threshold: float = 3.5,
) -> DataFrame:
    """Per-group robust (median/MAD) outlier counts.

    Modified z-score ``0.6745 * (x − median) / MAD`` with MAD =
    median(|x − median|) — robust where mean/stddev fences break on the
    heavy-tailed distributions corpus metrics actually have.  Two exact
    interpolated-median aggs (one per pass), each followed by a
    broadcast of the tiny per-group stats — the big side never shuffles
    more than the two hash aggs on the group key.  Groups with MAD = 0
    (over half the values identical) report NULL counts rather than
    dividing by zero.
    """
    v = F.col(value_col)
    med = df.groupBy(*group_cols).agg(
        F.percentile(v, F.lit(0.5)).alias("med")
    )
    mad = (
        df.join(F.broadcast(med), list(group_cols))
        .groupBy(*group_cols)
        .agg(
            F.first("med").alias("med"),
            F.percentile(F.abs(v - F.col("med")), F.lit(0.5)).alias("mad"),
        )
    )
    z = F.lit(0.6745) * (v - F.col("med")) / F.col("mad")
    return (
        df.join(F.broadcast(mad), list(group_cols))
        .groupBy(*group_cols)
        .agg(
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.count(
                F.when(F.col("mad") != 0, F.when(F.abs(z) > threshold, 1))
            ).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .withColumn(
            "n_outliers",
            F.when(F.col("mad") != 0, F.col("n_outliers")),
        )
    )
