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

from pyspark.sql import DataFrame, Window
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
    if lo_x is None or hi_x is None or lo_y is None or hi_y is None:
        raise ValueError(
            "cannot Z-order an empty frame or all-NULL key columns: "
            f"min/max of ({col_x}, {col_y}) came back NULL"
        )
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


def shard_assignment(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: str = "42",
) -> DataFrame:
    """Deterministic training-shard layout: every row gets a
    ``shard_id`` in ``[0, n_shards)`` and a ``shard_pos`` ordinal inside
    its shard, both pure functions of ``(id_col, seed)`` — the layout a
    trainer needs for reproducible data ordering, resumable epoch
    offsets, and leak-free re-sharding (the same document always lands
    in the same shard for a given seed, across runs, engines and
    cluster sizes — ``df.repartition`` is none of those).

    Within-shard order is the md5 of the id, i.e. a deterministic
    global shuffle: adjacent corpus documents (same crawl, same site)
    scatter across positions, which is what training-batch
    decorrelation wants, yet the order replays bit-identically.

    Scale shape: assignment is a map-only projection (one md5, shard id
    and order key both derived from it — one hash computation, not
    two).  The ordinal is ONE window shuffle with exactly ``n_shards``
    partitions — the same shuffle a layout write
    (``repartition(n_shards).sortWithinPartitions``) performs anyway,
    so materializing positions is free at write time; spill-safety
    comes from choosing n_shards so a shard fits an executor (the
    knob the caller owns either way).

    If true positions are not needed (manifests only), use
    :func:`shard_manifest`, which skips the window entirely.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = F.md5(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(seed))
    )
    keyed = df.withColumn("__h", h).withColumn(
        "shard_id",
        F.pmod(
            F.conv(F.substring("__h", 1, 8), 16, 10).cast("bigint"),
            F.lit(n_shards),
        ).cast("int"),
    )
    w = Window.partitionBy("shard_id").orderBy("__h", id_col)
    return (
        keyed.withColumn(
            "shard_pos", F.row_number().over(w).cast("long")
        )
        .drop("__h")
    )


def shard_manifest(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_shards: int,
    seed: str = "42",
) -> DataFrame:
    """Per-shard manifest for a :func:`shard_assignment` layout: row
    count, token / character totals (trainer epoch budgeting) and an
    order-independent content checksum (sum of 32-bit text-hash
    prefixes — verifies a re-built shard carries exactly the same
    documents without comparing bodies).

    Scale shape: map-only hashing + ONE groupBy into ``n_shards``
    groups (partial aggregation map-side; no window, no sort — the
    manifest does not need positions).  Output is n_shards rows —
    driver-safe at any corpus size.
    """
    from ..functions.text import ws_tokens

    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = F.md5(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(seed))
    )
    shard = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"),
        F.lit(n_shards),
    ).cast("int")
    text_hash = F.conv(
        F.substring(F.md5(F.col(text_col)), 1, 8), 16, 10
    ).cast("bigint")
    return (
        df.withColumn("shard_id", shard)
        .withColumn("__th", text_hash)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size(ws_tokens(F.col(text_col))))
            .cast("long")
            .alias("n_tokens"),
            F.sum(F.length(F.col(text_col))).cast("long").alias("n_chars"),
            F.sum("__th").cast("long").alias("content_checksum"),
        )
    )
