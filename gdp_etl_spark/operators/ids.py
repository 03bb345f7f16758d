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
