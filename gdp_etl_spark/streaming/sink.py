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


def _list_subdirs(spark, root_dir: str, prefix: str) -> list[str]:
    """Directory names under ``root_dir`` starting with ``prefix``, via
    the Hadoop FileSystem API (works on HDFS/S3A/file:, unlike
    os.listdir)."""
    jvm = spark.sparkContext._jvm
    root = jvm.org.apache.hadoop.fs.Path(root_dir)
    fs = root.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return []
    return [
        st.getPath().getName()
        for st in fs.listStatus(root)
        if st.isDirectory() and st.getPath().getName().startswith(prefix)
    ]


def run_cdc_apply(
    stream_changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    snapshot_dir: str,
    initial_snapshot: DataFrame,
    op_col: str = "op",
    timeout_sec: int = 120,
) -> DataFrame:
    """Streaming CDC: drain a change-event backlog (``availableNow``)
    into VERSIONED on-disk snapshots — per micro-batch,
    ``operators.cdc.apply_changes`` folds the batch into the previous
    version and writes ``snapshot_dir/v=<batch_id>``.

    Why versioned directories instead of one mutable snapshot path:

    * a parquet path cannot be overwritten by a frame that reads from
      it (read-modify-write fails mid-job) — version N reads N-1 and
      writes N, never touching its own input;
    * redelivery is idempotent: re-running batch N re-reads the still-
      present N-1 and overwrites the same ``v=N`` (apply_changes is
      idempotent for an identical batch);
    * consumers get snapshot isolation for free — readers of version
      N-1 are unaffected while N materializes.

    The streaming checkpoint lives INSIDE ``snapshot_dir`` — versions
    and the offsets that cut them are one unit (same coupling rationale
    as :func:`run_incremental_rollup`).  Old versions accumulate;
    retention (dropping ``v < latest - k``) is the caller's policy.

    Returns the latest snapshot as a DataFrame.  ``initial_snapshot``
    bootstraps ``v=-1`` once (skipped when it already exists, so
    resumed runs keep their history).
    """
    keys = list(keys)
    spark = stream_changes.sparkSession

    def _versions() -> list[int]:
        return sorted(
            int(d.split("=", 1)[1])
            for d in _list_subdirs(spark, snapshot_dir, "v=")
        )

    if -1 not in _versions():
        initial_snapshot.write.mode("overwrite").parquet(
            f"{snapshot_dir}/v=-1"
        )

    from ..operators.cdc import apply_changes

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        prev = max(v for v in _versions() if v < batch_id)
        snap = spark.read.parquet(f"{snapshot_dir}/v={prev}")
        nxt = apply_changes(snap, batch_df, keys, seq_col, op_col)
        nxt.write.mode("overwrite").parquet(f"{snapshot_dir}/v={batch_id}")

    q = (
        stream_changes.writeStream.foreachBatch(_process)
        .option("checkpointLocation", f"{snapshot_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError("cdc apply: backlog not drained")
    return spark.read.parquet(f"{snapshot_dir}/v={max(_versions())}")
