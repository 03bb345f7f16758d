"""foreachBatch incremental-merge sink: upsert each micro-batch into a
running snapshot (last-writer-wins by a version column).

The pattern behind every "stream into a table" deployment (Delta/Iceberg
MERGE INTO): per micro-batch, new rows are compacted into the snapshot
keyed by ``keys``, the highest ``version_col`` winning — so redelivered
and out-of-order updates converge to the same table no matter how the
batches were cut.

Implementation: snapshot ∪ batch → per-key max-version row, lineage cut
with ``localCheckpoint`` per batch (otherwise the plan grows by one
union per batch and replans from batch 0).  A table format would prune
unchanged files instead of re-shuffling the snapshot; at snapshot sizes
where that matters, swap the compaction step for a real MERGE INTO —
the sink's contract (converged last-writer-wins table) is unchanged.
"""

from __future__ import annotations

import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class IncrementalMergeSink:
    """Accumulates micro-batches into ``self.snapshot``."""

    def __init__(self, keys: Sequence[str], version_col: str):
        self.keys = list(keys)
        self.version_col = version_col
        self.snapshot: DataFrame | None = None

    def _compact(self, df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*self.keys).orderBy(
            F.col(self.version_col).desc(), *self.keys
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        merged = (
            batch_df
            if self.snapshot is None
            else self.snapshot.unionByName(batch_df)
        )
        self.snapshot = self._compact(merged).localCheckpoint(eager=True)


def run_incremental_merge(
    stream_df: DataFrame,
    keys: Sequence[str],
    version_col: str,
    timeout_sec: int = 120,
) -> DataFrame:
    """Replay the stream's backlog (``availableNow``) through the merge
    sink and return the converged snapshot."""
    sink = IncrementalMergeSink(keys, version_col)
    checkpoint = tempfile.mkdtemp(prefix="ckpt_merge_")
    q = (
        stream_df.writeStream.foreachBatch(sink.process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if sink.snapshot is None:
        raise RuntimeError("stream produced no micro-batches")
    return sink.snapshot


def run_incremental_rollup(
    stream_df: DataFrame,
    keys: Sequence[str],
    agg_exprs,
    log_dir: str,
    timeout_sec: int = 120,
) -> DataFrame:
    """Streaming materialized-view maintenance for ADDITIVE aggregates
    (counts/sums): per micro-batch, aggregate the batch and OVERWRITE
    its partial result into ``log_dir/batch_id=<n>/``; the view is the
    re-aggregation of the log.

    Why a partial-agg LOG instead of merging into one snapshot:
    overwrite-per-batch-directory makes redelivery idempotent for free
    (foreachBatch may re-run a batch after a crash — an additive merge
    would double-count it; rewriting the same directory converges), the
    per-batch write is tiny (group-cardinality rows), and reads stay
    one cheap re-aggregation until a compaction folds old batches.
    This is exactly the recipe a table format's MERGE would hide; the
    log keeps it engine-native and restart-safe.

    Returns the converged view (one row per key group).  ``agg_exprs``
    is a list of ALREADY-ALIASED additive aggregate Columns applied
    identically to each batch and to the final re-aggregation via
    ``sum(<alias>)`` — so each must be a plain count or sum.

    The streaming checkpoint lives INSIDE ``log_dir`` (``_checkpoint``)
    — the log and the offsets that cut it are one unit.  A fresh
    checkpoint against an existing log would re-cut batches under the
    same ids differently and leave stale higher-numbered partials to
    double-count; pinning the checkpoint to the log makes every re-run
    resume (and overwrite) the same batch sequence.
    """
    keys = list(keys)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        part = batch_df.groupBy(*keys).agg(*agg_exprs)
        part.write.mode("overwrite").parquet(
            f"{log_dir}/batch_id={batch_id}"
        )

    checkpoint = f"{log_dir}/_checkpoint"
    q = (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError("incremental rollup: backlog not drained")
    spark = stream_df.sparkSession
    # discover batch partials through the Hadoop FileSystem API, not
    # os.listdir: log_dir is a Spark path (HDFS/S3A/file:) that need
    # not exist on the driver's local filesystem
    jvm = spark.sparkContext._jvm
    root = jvm.org.apache.hadoop.fs.Path(log_dir)
    fs = root.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    batch_dirs = (
        [
            st.getPath().toString()
            for st in fs.listStatus(root)
            if st.isDirectory()
            and st.getPath().getName().startswith("batch_id=")
        ]
        if fs.exists(root)
        else []
    )
    if not batch_dirs:
        raise RuntimeError("stream produced no micro-batches")
    log = spark.read.parquet(*batch_dirs)
    value_cols = [c for c in log.columns if c not in keys]
    return log.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in value_cols]
    )
