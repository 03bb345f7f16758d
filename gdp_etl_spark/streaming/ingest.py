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


def _batch_committed(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` holds a COMPLETED parquet write (Spark's
    ``_SUCCESS`` marker) — a crash mid-write leaves files without the
    marker, which must read as 'absent' so the re-run rewrites them."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/_SUCCESS")
    return p.getFileSystem(conf).exists(p)


def run_dedup_ingest(
    stream_docs: DataFrame,
    text_col: str,
    id_col: str,
    index_table: str,
    out_dir: str,
    timeout_sec: int = 120,
) -> None:
    """Streaming corpus ingestion with EXACTLY-ONCE admission built
    from AT-LEAST-ONCE delivery — the composition the materialized
    dedup index exists for: per micro-batch, admit only never-seen
    texts (:func:`~gdp_etl_spark.operators.dedup.dedup_against_index`:
    within-batch keep-first + zero-shuffle anti-join against the
    bucketed index), land them in ``out_dir/batch=<id>``, then fold
    their hashes into the index
    (:func:`~gdp_etl_spark.operators.dedup.append_to_dedup_index`).

    foreachBatch re-runs a batch after any crash; every crash window
    converges because the two writes are ordered docs-FIRST and the
    re-run branches on the batch directory's ``_SUCCESS`` marker:

    * crash before/mid doc-write — no marker: the re-run recomputes the
      same admissions (the index has no new hashes yet) and rewrites
      the directory (``overwrite`` clears partial files);
    * crash after the doc-write, before/mid the hash append — marker
      present: the re-run NEVER rewrites the directory (a re-computed
      admission set could be a subset if some hashes landed — rewriting
      would lose docs); it re-appends ALL of the directory's hashes
      instead.  Duplicate index entries are harmless by the index's
      contract (anti-join tests existence), so "re-append everything"
      is the idempotent completion;
    * crash after both, before the offset commit — same branch:
      directory kept, hashes re-appended, converged.

    An admission-empty batch writes nothing (no marker) and re-runs to
    the same nothing.  The streaming checkpoint lives INSIDE
    ``out_dir`` (``_checkpoint``) — the landed batches and the offsets
    that cut them are one unit, same coupling rationale as
    ``run_incremental_rollup``.
    """
    from ..operators.dedup import append_to_dedup_index, dedup_against_index

    spark = stream_docs.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        # everything runs on the MICRO-BATCH's session (the stream's
        # clone): it is the session that executes the plans, so probe,
        # append and cache invalidation all see one catalog — mixing in
        # the outer session leaves its relation cache serving stale
        # pre-append file listings intermittently (observed flaky)
        bspark = batch_df.sparkSession
        path = f"{out_dir}/batch={batch_id}"
        if _batch_committed(bspark, path):
            # redelivery after a completed doc-write: complete the hash
            # append from the landed docs; never touch the directory
            append_to_dedup_index(
                bspark.read.parquet(path), text_col, index_table
            )
            return
        admitted = dedup_against_index(
            bspark, batch_df, text_col, id_col, index_table
        ).localCheckpoint(eager=True)
        if admitted.isEmpty():
            return
        admitted.write.mode("overwrite").parquet(path)
        append_to_dedup_index(admitted, text_col, index_table)

    q = (
        stream_docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError("dedup ingest did not drain the backlog")
