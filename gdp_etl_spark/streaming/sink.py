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
