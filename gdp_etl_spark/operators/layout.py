"""Data-layout operators: space-filling-curve (Z-order) clustering keys.

At 100 TB the scan is the bottleneck, and the scan is only as cheap as
the layout lets it be: min/max column statistics on parquet row groups
(and partition-level file stats) prune I/O *only if* rows that are close
in the query predicates' space are close on disk.  Sorting by a single
column clusters that column and scatters every other; interleaving the
bits of several columns (Morton / Z-order, the technique behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``) bounds the min/max range of ALL
participating columns in every bucket, so predicates on any of them
skip most of the data.

The reference engine has no layout story (single-node eager R, one CSV
out — see SURVEY.md §4); this module is part of the mandated
beyond-reference scale surface.  The raw interleave column helper is
:func:`gdp_etl_spark.io.zorder_key` (pre-bucketized inputs); this
module adds the end-to-end operator: observed-range quantization and
the per-bucket envelope evidence table.

Everything here is deterministic integer math on the JVM side — no
UDFs, no sampling — so results are bit-stable across partition counts
and reproducible by the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_keys(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 16,
) -> DataFrame:
    """Append a Z-order clustering key ``zval`` interleaving the bits of
    two integer columns (each first quantized onto ``2**bits`` cells of
    its observed [min, max] range).

    Writing the table ``repartitionByRange("zval").sortWithinPartitions
    ("zval")`` then gives every file a narrow min/max envelope in BOTH
    dimensions — the layout that makes parquet row-group skipping work
    for predicates on either column.

    Scale shape: one 4-value global min/max aggregate (a driver scalar
    read, the same documented pattern as the base-year broadcasts —
    dimension-free, never data-sized), then a map-only projection: the
    quantized cells are materialized ONCE and the interleave is plain
    shift/mask bigint codegen.  No shuffle at all until the caller's
    layout write.
    """
    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.min(col_x).cast("long"),
        F.max(col_x).cast("long"),
        F.min(col_y).cast("long"),
        F.max(col_y).cast("long"),
    ).first()
    span_x = max(1, hi_x - lo_x)
    span_y = max(1, hi_y - lo_y)
    top = (1 << bits) - 1
    # div on non-negative bigints: Spark `div` (truncate) == DuckDB `//`
    # (floor); negative operands never reach it because lo is subtracted.
    q = df.withColumn(
        "__qx",
        F.expr(f"((cast({col_x} as bigint) - {lo_x}) * {top}) div {span_x}"),
    ).withColumn(
        "__qy",
        F.expr(f"((cast({col_y} as bigint) - {lo_y}) * {top}) div {span_y}"),
    )
    from ..io import zorder_key

    # The quantized inputs are materialized columns (each is referenced
    # `bits` times in the interleave; an inlined expression would be
    # re-evaluated per reference).
    return (
        q.withColumn("zval", zorder_key("__qx", "__qy", bits))
        .drop("__qx", "__qy")
    )


def zorder_bucket_stats(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 16,
    n_buckets: int = 64,
) -> DataFrame:
    """The data-skipping evidence table: assign each row to one of
    ``n_buckets`` contiguous Z-value ranges (what a layout write would
    put in one file) and report each bucket's row count and min/max
    envelope in BOTH source dimensions.

    On a Z-ordered layout every bucket's envelope covers ~``1/sqrt(n)``
    of each dimension's range (vs. ~all of the second dimension under a
    single-column sort), which is exactly the statistic a scan planner
    prunes on.  One aggregation shuffle keyed on the bucket id — bounded
    output, bounded state.
    """
    keyed = zorder_keys(df, col_x, col_y, bits)
    zspan = 1 << (2 * bits)
    bucket = F.expr(f"(zval * {n_buckets}) div {zspan}").cast("int")
    return (
        keyed.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min(col_x).alias("min_x"),
            F.max(col_x).alias("max_x"),
            F.min(col_y).alias("min_y"),
            F.max(col_y).alias("max_y"),
        )
    )
