"""Incremental file ingestion: the checkpointed availableNow batch job.

The production pattern for landing a continuously-arriving directory
(an upstream team drops parquet/JSONL files; you materialize a curated
table): ONE streaming query with a durable checkpoint, run on a
schedule with ``trigger(availableNow=True)``.  Each run processes
exactly the files that arrived since the last run — the checkpoint's
file-source log is the state — then exits.  Restart-safe and
exactly-once into a transactional-enough sink (directory-append
parquet here; swap the format for a table format in production).

Why this beats the two naive alternatives at 100 TB:

* full re-read + overwrite — re-processes the entire history every
  run; cost grows with table size, not arrival rate.
* hand-rolled "list files, diff against a manifest" — rebuilds the
  file-source log Spark already maintains, usually without its
  compaction or its atomic commit protocol.

``maxFilesPerTrigger``/``maxBytesPerTrigger`` bound each micro-batch
within the run, so a backlog spike degrades into more batches, not a
bigger one.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def incremental_file_ingest(
    spark: SparkSession,
    src_dir: str,
    schema: str,
    checkpoint_dir: str,
    out_dir: str,
    src_format: str = "parquet",
    transform: Callable[[DataFrame], DataFrame] | None = None,
    max_files_per_trigger: int | None = None,
    timeout_sec: int = 120,
) -> None:
    """Process every source file not yet recorded in ``checkpoint_dir``
    through ``transform`` and append to ``out_dir``; return when the
    backlog is drained.  Calling again later picks up only new files."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.format(src_format).load(src_dir)
    if transform is not None:
        stream = transform(stream)
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        # backlog not drained within the budget: stop the query so the
        # next scheduled run can take the checkpoint lock, and fail
        # loudly — silently returning would break the "backlog drained
        # on return" contract and race the next invocation
        q.stop()
        raise TimeoutError(
            f"incremental_file_ingest: backlog not drained within "
            f"{timeout_sec}s (processed micro-batches are committed; "
            f"re-run to continue from the checkpoint)"
        )
