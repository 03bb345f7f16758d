"""Dense global row-ID assignment without the single-partition trap.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses the
whole table onto ONE task — the canonical accidental scale killer when
a pipeline needs stable example IDs, global sample ordinals, or
resumable cursor positions over a 100-TB corpus.

The distributed formulation is the two-pass prefix-sum:

1. ``repartitionByRange`` on the order key — each partition holds a
   contiguous key range, ranges are mutually ordered,
2. count rows per partition (tiny: one row per partition),
3. prefix-sum the counts into per-partition offsets (a window over the
   #partitions-row frame — driver-scale, not data-scale),
4. broadcast the offsets back; final ID = partition offset + local
   ``row_number`` within the partition.

Equal order keys land in the same range partition (RangePartitioner
boundaries are resolved by binary search, never splitting a key), so
the assignment is a correct dense rank of the total order; pass a
UNIQUE composite order (tie-break on a key column) to make every ID
bit-deterministic across runs, partition counts, and engines — the
same rule SQL ``row_number`` needs for a stable result.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_row_ids(
    df: DataFrame,
    order_cols: Sequence[str],
    id_col: str = "row_id",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col``: dense ``start``-based global ordinals of the
    total order ``order_cols`` — distributed (no single-partition
    exchange on the data path)."""
    order_cols = list(order_cols)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *[F.col(c) for c in order_cols])
    # materialize the range partitioning ONCE: the counts branch and the
    # row-numbering branch below would otherwise each re-execute the
    # exchange, and RangePartitioner's sampled boundaries are not stable
    # across materializations (the sampling seed folds in the RDD id) —
    # offsets computed against one partitioning and row_numbers against
    # another silently corrupt every ID after the first boundary drift.
    # localCheckpoint truncates lineage, so a lost block fails the job
    # instead of recomputing divergent boundaries.
    with_pid = ranged.withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint()
    counts = with_pid.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    w_off = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    w_local = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        with_pid.join(F.broadcast(offsets), "__pid")
        .withColumn(
            id_col,
            (
                F.row_number().over(w_local).cast("long")
                + F.col("__off")
                + F.lit(start - 1)
            ),
        )
        .drop("__pid", "__off")
    )


def grouped_ntile(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence,
    n_buckets: int,
    bucket_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group ``ntile(n_buckets)`` WITHOUT a per-group window
    partition — the de-skewed form of
    ``ntile(b) OVER (PARTITION BY group ORDER BY ...)``.

    The window form pins each group on ONE task, so a dominant group
    (think: the majority language of a web corpus, ~half the rows)
    becomes an unsplittable straggler at scale.  Here the group is
    spread across ordinary range partitions and the rank is stitched
    with the same two-pass prefix-sum as :func:`assign_row_ids`:

    1. ``repartitionByRange`` on (group, order) — each group occupies a
       contiguous RUN of partitions, every partition is ~equal-size
       regardless of group skew;
    2. count rows per (partition, group) and prefix-sum counts into
       per-(partition, group) offsets — a window over the
       #partitions × #groups-row counts frame (statistics-scale, not
       data-scale);
    3. broadcast offsets + per-group totals back; per-group rank =
       offset + local ``row_number`` within (partition, group);
    4. bucket from rank by ntile's exact even-split rule (the first
       ``n mod b`` buckets take ``ceil(n/b)`` rows, the rest
       ``floor(n/b)``) — bit-identical to every SQL engine's ``ntile``
       given the same deterministic total order, so results stay
       oracle-replayable.

    ``order_cols`` must be a UNIQUE total order within each group
    (tie-break on an id column), the same rule a stable windowed
    ``ntile`` needs.  The offsets/totals broadcasts assume the group
    count is bounded (languages, sources, splits) — statistics-sized,
    not corpus-sized.  A NULL group is ONE group (null-safe joins),
    exactly as ``PARTITION BY`` treats it — rows are never dropped.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    group_cols = list(group_cols)
    order_exprs = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(
        n, *[F.col(c) for c in group_cols], *order_exprs
    )
    # one materialization of the range partitioning — see assign_row_ids:
    # RangePartitioner boundaries are not stable across re-executions, and
    # the counts branch and the ranking branch must see the SAME layout.
    with_pid = ranged.withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint()
    counts = with_pid.groupBy("__pid", *group_cols).agg(
        F.count(F.lit(1)).alias("__n")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__pid",
        *group_cols,
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    totals = counts.groupBy(*group_cols).agg(F.sum("__n").alias("__tot"))
    w_local = Window.partitionBy("__pid", *group_cols).orderBy(*order_exprs)
    # NULL-SAFE joins: a windowed ntile puts all NULL-group rows in one
    # partition, so this formulation must keep them too — a name-list
    # equi-join would silently DROP every NULL-group row (NULL keys
    # never equi-match), which is data loss, not an edge case, in a
    # corpus pipeline (think lang = NULL).
    off = offsets.select(
        F.col("__pid").alias("__o_pid"),
        *[F.col(c).alias(f"__o_{c}") for c in group_cols],
        "__off",
    )
    off_cond = (F.col("__pid") == F.col("__o_pid"))
    for c in group_cols:
        off_cond = off_cond & F.col(c).eqNullSafe(F.col(f"__o_{c}"))
    tot = totals.select(
        *[F.col(c).alias(f"__t_{c}") for c in group_cols], "__tot"
    )
    tot_cond = F.lit(True)
    for c in group_cols:
        tot_cond = tot_cond & F.col(c).eqNullSafe(F.col(f"__t_{c}"))
    ranked = (
        with_pid.join(F.broadcast(off), off_cond)
        .join(F.broadcast(tot), tot_cond)
        .drop(
            "__o_pid",
            *[f"__o_{c}" for c in group_cols],
            *[f"__t_{c}" for c in group_cols],
        )
        .withColumn(
            "__rank",
            F.row_number().over(w_local).cast("long") + F.col("__off"),
        )
    )
    # ntile's even-split rule from (rank, total): the first `rem`
    # buckets hold q+1 rows, the rest q.  floor(double) is exact here —
    # the numerator is < 2^52 for any real row count.
    r, tot, b = F.col("__rank"), F.col("__tot"), F.lit(n_buckets)
    q = F.floor(tot / b)
    rem = F.pmod(tot, b)
    big = rem * (q + F.lit(1))  # rows living in the larger buckets
    bucket = (
        F.when(r <= big, F.floor((r - 1) / (q + F.lit(1))) + F.lit(1))
        .otherwise(
            rem + F.floor((r - big - F.lit(1)) / F.greatest(q, F.lit(1))) + F.lit(1)
        )
        .cast("int")
    )
    return ranked.withColumn(bucket_col, bucket).drop(
        "__pid", "__off", "__tot", "__rank"
    )
