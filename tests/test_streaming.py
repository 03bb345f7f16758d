"""Streaming/batch parity: replay the events parquet through the
file-stream source and assert the windowed results equal the batch ones."""

import pytest
from pyspark.sql import functions as F

from gdp_etl_spark.operators.sessions import session_stats
from gdp_etl_spark.streaming import (
    run_available_now_to_memory,
    running_user_stats,
    session_window_stats,
    stream_events,
    tumbling_counts,
)

from .conftest import rows

SF_DIR = "/root/testdata/sf0.001"


def _batch_events(spark):
    from gdp_etl_spark.io import load_events

    return load_events(spark, SF_DIR)


def test_tumbling_stream_matches_batch(spark):
    got = run_available_now_to_memory(
        tumbling_counts(stream_events(spark, SF_DIR)), "t_tumbling"
    )
    expect = (
        _batch_events(spark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n")
    )
    assert rows(got) == rows(expect)


def test_session_stream_matches_batch_session_counts(spark):
    got = run_available_now_to_memory(
        session_window_stats(stream_events(spark, SF_DIR)), "t_sessions"
    )
    stream_counts = dict(
        rows(got.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_sessions")))
    )
    batch_counts = dict(
        rows(
            session_stats(_batch_events(spark), "user_id", "ts", gap_seconds=1800)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_sessions"))
        )
    )
    assert stream_counts == batch_counts
    # per-session event totals must also agree
    assert got.agg(F.sum("n_events")).first()[0] == _batch_events(spark).count()


def test_stateful_running_stats_matches_batch(spark):
    """applyInPandasWithState custom stateful operator: the final
    per-user running totals must equal the batch aggregation.
    (NoTimeout path — Spark 4.1.2 has a planner NPE re-planning
    ProcessingTimeTimeout batches under availableNow, see
    streaming/stateful.py docstring.)"""
    import tempfile

    ev = stream_events(spark, SF_DIR).select(
        "user_id", "value", F.unix_micros("ts").alias("ts_us")
    )
    q = (
        running_user_stats(ev, idle_timeout_ms=0)
        .writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("t_stateful")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in out.withColumn("rn", F.row_number().over(w)).filter("rn=1").collect()
    }
    batch = {
        r["user_id"]: (r["n"], r["t"])
        for r in _batch_events(spark)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert set(final) == set(batch)
    for k in batch:
        assert final[k][0] == batch[k][0]
        assert final[k][1] == pytest.approx(batch[k][1], rel=1e-9)


def test_transform_with_state_counts_match_batch(spark):
    """transformWithStateInPandas (Spark 4 arbitrary stateful API,
    MapState per user): after replaying the backlog, the latest emitted
    count per (user, event_type) must equal the batch groupBy count.
    Needs protobuf (the API's state-server protocol) + RocksDB state
    store — skipped where the env lacks them."""
    import tempfile

    pytest.importorskip(
        "google.protobuf", reason="transformWithState needs protobuf"
    )
    from gdp_etl_spark.streaming import event_type_counts

    key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(key)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        ev = stream_events(spark, SF_DIR).select("user_id", "event_type")
        q = (
            event_type_counts(ev)
            .writeStream.format("memory")
            .queryName("t_tws")
            .outputMode("update")
            .option("checkpointLocation", tempfile.mkdtemp())
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.table("t_tws")
        # counts are monotone per key: the final value is the max emitted
        final = {
            (r["user_id"], r["event_type"]): r["mx"]
            for r in out.groupBy("user_id", "event_type")
            .agg(F.max("n").alias("mx"))
            .collect()
        }
        batch = {
            (r["user_id"], r["event_type"]): r["n"]
            for r in _batch_events(spark)
            .groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert final == batch
    finally:
        spark.conf.set(key, saved)


def test_transform_with_state_gate_message_without_protobuf(spark):
    """Where protobuf is absent the operator must fail fast at plan
    construction with an actionable message, not crash a streaming
    worker mid-query."""
    try:
        import google.protobuf  # noqa: F401

        pytest.skip("protobuf present — gate does not fire")
    except ImportError:
        pass
    from gdp_etl_spark.streaming import event_type_counts

    ev = stream_events(spark, SF_DIR).select("user_id", "event_type")
    with pytest.raises(ImportError, match="protobuf"):
        event_type_counts(ev)


def test_stream_dedup_drops_redelivered_batch(spark, tmp_path):
    """At-least-once replay: the same events file delivered twice must
    come out once per event_id."""
    import tempfile

    from gdp_etl_spark.streaming import dedup_within_watermark

    src = tmp_path / "dup_src"
    src.mkdir()
    ev = _batch_events(spark).limit(200)
    # two identical deliveries, one file each
    ev.coalesce(1).write.parquet(str(src / "d1"))
    ev.coalesce(1).write.parquet(str(src / "d2"))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = dedup_within_watermark(stream, keys=("event_id",), watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_dedup")
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()


def test_stream_static_enrich_matches_batch(spark):
    """Stream-static broadcast join parity: per-batch enrichment equals
    the batch join."""
    import tempfile

    from gdp_etl_spark.streaming import enrich_with_static

    dim = (
        _batch_events(spark)
        .select("user_id")
        .distinct()
        .withColumn("user_bucket", (F.col("user_id") % 7).cast("int"))
    )
    out = enrich_with_static(stream_events(spark, SF_DIR), dim, on="user_id")
    q = (
        out.writeStream.format("memory")
        .queryName("t_enrich")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_enrich").groupBy("user_bucket").count()
    expect = (
        _batch_events(spark).join(dim, "user_id").groupBy("user_bucket").count()
    )
    assert rows(got) == rows(expect)
    assert spark.table("t_enrich").filter("user_bucket IS NULL").count() == 0


def test_watermark_drops_late_data(spark, tmp_path):
    """Real late-data scenario: batch 2 carries an event older than
    (max event time − watermark) when batch 3 closes the window; the
    late row must be dropped from the aggregate, and an in-watermark
    late row must be counted."""
    import time

    src = tmp_path / "stream_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, rows):
        spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / name))

    from datetime import datetime

    t = datetime(2024, 1, 1, 10, 0, 0)

    def at(minute):
        return datetime(2024, 1, 1, 10, minute, 0)

    # batch 1: events at 10:00-10:05
    write_batch("b1", [(1, at(0)), (1, at(5))])
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")  # append emits a window only once it's closed
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: advance event time far ahead (10:40) AND a late row at
        # 10:01 — within no watermark trouble yet for the 10:00 window?
        # watermark after b1 = 10:05-10:10 => still open; b2's late row
        # lands in the 10:00-05 window legally, then max ts 10:40 moves
        # the watermark to 10:30, closing every early window.
        write_batch("b2", [(1, at(40)), (1, at(1))])
        q.processAllAvailable()
        # batch 3: a VERY late row at 10:02 (watermark is now 10:30) —
        # must be discarded — plus a fresh row keeping the stream moving.
        write_batch("b3", [(1, at(2)), (1, at(45))])
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["start"].minute: r["n"] for r in spark.table("t_late").collect()}
    # closed [10:00,10:05) window: 1 original (10:00) + the batch-2
    # in-watermark late row (10:01) = 2.  The batch-3 row at 10:02 was
    # beyond the 10:30 watermark and MUST be dropped (3 would mean the
    # watermark leaked).  10:05 lives in the next window.
    assert got.get(0) == 2
    assert got.get(5) == 1


def test_incremental_merge_converges_to_batch_upsert(spark, tmp_path):
    """Multi-batch foreachBatch merge == batch last-writer-wins, no
    matter how the files were cut into micro-batches, including
    redelivered duplicates."""
    import pandas as pd

    from gdp_etl_spark.streaming.sink import run_incremental_merge

    src = tmp_path / "src"
    src.mkdir()
    # three files → three micro-batches (maxFilesPerTrigger=1):
    # k=1 updated twice, k=2 redelivered identically, k=3 insert-only
    pd.DataFrame(
        {"k": [1, 2], "version": [1, 1], "v": ["a", "x"]}
    ).to_parquet(src / "f1.parquet")
    pd.DataFrame(
        {"k": [1, 2], "version": [2, 1], "v": ["b", "x"]}
    ).to_parquet(src / "f2.parquet")
    pd.DataFrame(
        {"k": [1, 3], "version": [3, 1], "v": ["c", "z"]}
    ).to_parquet(src / "f3.parquet")

    stream = (
        spark.readStream.schema("k bigint, version bigint, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    snap = run_incremental_merge(stream, ["k"], "version")
    got = sorted(tuple(r) for r in snap.select("k", "version", "v").collect())
    assert got == [(1, 3, "c"), (2, 1, "x"), (3, 1, "z")]


def test_stream_stream_join_matches_batch(spark):
    from gdp_etl_spark.streaming import attribute_purchases

    got = run_available_now_to_memory(
        attribute_purchases(stream_events(spark, SF_DIR)),
        "t_ssjoin",
        output_mode="append",
    )
    expect = attribute_purchases(_batch_events(spark))
    assert rows(got) == rows(expect)
    assert rows(expect)  # non-vacuous: sf0.001 must contain matched pairs


def test_outer_stream_join_emits_null_after_watermark_passes(spark, tmp_path):
    """A click with no purchase must surface with NULL purchase columns —
    but only once the watermark proves no match can still arrive."""
    import tempfile
    from datetime import datetime

    from gdp_etl_spark.streaming import attribute_purchases_outer

    def at(h, m=0):
        return datetime(2024, 1, 1, h, m)

    src = tmp_path / "outer_src"
    src.mkdir()
    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / name)
        )

    # batch 1: user 1 click->purchase (matched); user 2 click, no purchase
    write_batch(
        "b1",
        [
            (1, at(10, 0), 1, "click"),
            (2, at(10, 30), 1, "purchase"),
            (3, at(10, 0), 2, "click"),
        ],
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = attribute_purchases_outer(
        stream, max_lag="1 hour", watermark="1 hour"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_outer")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark is still at 10:30-1h => the unmatched click CANNOT
        # have been emitted yet
        assert spark.table("t_outer").filter("purchase_id IS NULL").count() == 0
        # the global watermark is the MIN across the click and purchase
        # watermark nodes, so later batches must advance BOTH sides —
        # each carries a (matched) click+purchase pair at a later time
        write_batch(
            "b2", [(9, at(14, 0), 9, "click"), (11, at(14, 0), 9, "purchase")]
        )
        q.processAllAvailable()
        write_batch(
            "b3", [(12, at(18, 0), 7, "click"), (13, at(18, 0), 7, "purchase")]
        )
        q.processAllAvailable()
        got = spark.table("t_outer")
        matched = got.filter("purchase_id IS NOT NULL").collect()
        assert sorted(
            (r["user_id"], r["click_id"], r["purchase_id"]) for r in matched
        ) == [(1, 1, 2), (7, 12, 13), (9, 9, 11)]
        # the unmatched click finally surfaced, with NULLs
        unmatched = got.filter("purchase_id IS NULL").collect()
        assert {r["click_id"] for r in unmatched} == {3}
    finally:
        q.stop()


class TestIncrementalFileIngest:
    def test_resume_processes_only_new_files(self, spark, tmp_path):
        """The checkpoint is the state: run 1 lands batch A, run 2 (new
        files dropped in between) lands ONLY batch B — no dup of A —
        and an idle run 3 lands nothing."""
        from pyspark.sql import functions as F

        from gdp_etl_spark.streaming.ingest import incremental_file_ingest

        src = tmp_path / "src"
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        schema = "k long, v string"

        def land(name, lo, hi):
            spark.range(lo, hi).select(
                F.col("id").alias("k"),
                F.concat(F.lit("v"), F.col("id")).alias("v"),
            ).coalesce(1).write.mode("overwrite").parquet(str(src / name))

        land("batch_a", 0, 100)
        incremental_file_ingest(
            spark, str(src / "*"), schema, ckpt, out,
            transform=lambda df: df.withColumn("vv", F.upper("v")),
        )
        first = spark.read.parquet(out)
        assert first.count() == 100
        assert first.filter(F.col("vv") != F.upper("v")).count() == 0

        land("batch_b", 100, 150)
        incremental_file_ingest(
            spark, str(src / "*"), schema, ckpt, out,
            transform=lambda df: df.withColumn("vv", F.upper("v")),
        )
        second = spark.read.parquet(out)
        assert second.count() == 150                     # A not re-landed
        assert second.select("k").distinct().count() == 150

        incremental_file_ingest(
            spark, str(src / "*"), schema, ckpt, out,
            transform=lambda df: df.withColumn("vv", F.upper("v")),
        )
        assert spark.read.parquet(out).count() == 150    # idle run: no-op


class TestPythonStreamingDataSource:
    def test_stream_equals_batch_and_batches_are_bounded(self, spark, tmp_path):
        """The Spark 4 Python DataSourceStreamReader: offset-tracked
        micro-batches over the tick feed must reproduce EXACTLY the
        batch read (rows are a pure function of the index), across
        multiple bounded micro-batches."""
        from gdp_etl_spark.sources_pyds import TickFeedDataSource

        spark.dataSource.register(TickFeedDataSource)
        stream = (
            spark.readStream.format("tick_feed")
            .option("rows", 900)
            .option("rowsPerBatch", 250)   # -> 4 micro-batches
            .option("partitions", 3)
            .load()
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("tick_stream")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.table("tick_stream")
        batch = (
            spark.read.format("tick_feed").option("rows", 900).load()
        )
        assert got.count() == 900
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, batch.collect())
        )
        # progress log shows multiple bounded batches, not one big one
        assert len(q.recentProgress) >= 3


class TestIncrementalRollup:
    def test_view_equals_batch_and_redelivery_is_idempotent(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from gdp_etl_spark.streaming.sink import run_incremental_rollup

        src = tmp_path / "src"
        for b in range(3):
            spark.range(b * 100, (b + 1) * 100).select(
                (F.col("id") % 7).alias("k"), F.col("id").alias("v")
            ).coalesce(1).write.parquet(str(src / f"f{b}"))
        stream = (
            spark.readStream.schema("k long, v long")
            .option("maxFilesPerTrigger", 1)     # 3 micro-batches
            .parquet(str(src / "*"))
        )
        log_dir = str(tmp_path / "log")
        view = run_incremental_rollup(
            stream, ["k"],
            [F.count(F.lit(1)).alias("n"), F.sum("v").alias("v_sum")],
            log_dir,
        )
        batch = (
            spark.read.parquet(str(src / "*"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("v_sum"))
        )
        assert sorted(map(tuple, view.collect())) == sorted(
            map(tuple, batch.collect())
        )
        # redelivery: re-writing batch 1's partial (same directory) must
        # not change the view — overwrite-per-batch is the idempotency
        import os
        path1 = os.path.join(log_dir, "batch_id=1")
        part = spark.read.parquet(path1)
        rows, schema = part.collect(), part.schema   # materialize BEFORE overwrite
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(path1)
        batch_dirs = [os.path.join(log_dir, d) for d in os.listdir(log_dir)
                      if d.startswith("batch_id=")]
        log = spark.read.parquet(*batch_dirs)
        again = log.groupBy("k").agg(
            F.sum("n").alias("n"), F.sum("v_sum").alias("v_sum")
        )
        assert sorted(map(tuple, again.collect())) == sorted(
            map(tuple, batch.collect())
        )


def test_python_stream_source_resumes_from_checkpoint(spark, tmp_path):
    """Restart safety: a NEW reader instance (fresh _current=0) against
    an existing checkpoint must resume at the committed offset, not
    re-emit from 0 — offsets re-sync from the engine's partitions()/
    commit() calls."""
    from gdp_etl_spark.sources_pyds import TickFeedDataSource

    spark.dataSource.register(TickFeedDataSource)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run(rows):
        q = (
            spark.readStream.format("tick_feed")
            .option("rows", rows).option("rowsPerBatch", 200)
            .option("partitions", 3).load()
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append").option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(400)                     # first run: rows 0..399
    assert spark.read.parquet(out).count() == 400
    run(900)                     # restart, feed grew: must add ONLY 400..899
    ids = sorted(r["tick_id"] for r in spark.read.parquet(out).collect())
    assert ids == list(range(900))   # no gaps, NO duplicates


def test_run_cdc_apply_versioned_snapshots(spark, tmp_path):
    """Streaming CDC: two change files -> two micro-batches
    (maxFilesPerTrigger=1) applied as versioned snapshots; a resumed
    run (same checkpoint) applies ONLY the new backlog on top."""
    from gdp_etl_spark.streaming.sink import run_cdc_apply

    src = str(tmp_path / "changes")
    snap_dir = str(tmp_path / "snap")
    schema = "k long, seq long, op string, v double"
    initial = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")

    spark.createDataFrame(
        [(1, 1, "update", 11.0), (3, 2, "insert", 30.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(2, 3, "delete", None)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = run_cdc_apply(stream, ["k"], "seq", snap_dir, initial)
    got = sorted((r["k"], r["v"]) for r in out.collect())
    assert got == [(1, 11.0), (3, 30.0)]          # 2 deleted, 1 updated, 3 inserted

    # resume: one more change file, same checkpoint -> only the new
    # batch applies, on top of the latest existing version
    spark.createDataFrame(
        [(3, 4, "update", 33.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out2 = run_cdc_apply(stream2, ["k"], "seq", snap_dir, initial)
    got2 = sorted((r["k"], r["v"]) for r in out2.collect())
    assert got2 == [(1, 11.0), (3, 33.0)]
    # version history is on disk: v=-1 bootstrap plus one per batch
    import os
    versions = sorted(d for d in os.listdir(snap_dir) if d.startswith("v="))
    assert "v=-1" in versions and len(versions) >= 3


class TestStreamingDedupIngest:
    """run_dedup_ingest: exactly-once corpus admission from
    at-least-once foreachBatch delivery, via the persisted dedup
    index."""

    def _setup_index(self, spark, table):
        import shutil

        from gdp_etl_spark.operators.dedup import write_dedup_index

        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{wh}/{table}", ignore_errors=True)
        corpus = spark.createDataFrame(
            [(1, "seen one"), (2, "seen two")], "doc_id long, text string"
        )
        write_dedup_index(corpus, "text", table, n_buckets=4)

    def _stream(self, spark, src):
        return (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)     # one file = one batch
            .parquet(str(src / "*"))
        )

    def test_admissions_across_batches_and_runs(self, spark, tmp_path):
        from gdp_etl_spark.streaming.ingest import run_dedup_ingest

        table = "t_stream_idx"
        self._setup_index(spark, table)
        src, out = tmp_path / "src", tmp_path / "out"
        src.mkdir()
        spark.createDataFrame(
            [(10, "seen one"), (11, "fresh a"), (12, "fresh a")],
            "doc_id long, text string",
        ).write.parquet(str(src / "f1"))
        spark.createDataFrame(
            [(20, "fresh a"), (21, "fresh b")], "doc_id long, text string"
        ).write.parquet(str(src / "f2"))

        run_dedup_ingest(
            self._stream(spark, src), "text", "doc_id", table, str(out)
        )
        landed = spark.read.parquet(f"{out}/batch=*")
        got = {r["doc_id"] for r in landed.collect()}
        # the corpus re-crawl (10) is rejected; EXACTLY ONE copy of
        # 'fresh a' is admitted (which one depends on micro-batch
        # arrival order — the file source orders part files by mtime,
        # so first-arrival wins across batches; within a batch the
        # lowest id wins) and 'fresh b' (21) is admitted
        assert 10 not in got
        assert len(got & {11, 12, 20}) == 1
        assert 21 in got and len(got) == 2

        # a later run ingests only newly-arrived files, same semantics
        spark.createDataFrame(
            [(30, "fresh b"), (31, "fresh c")], "doc_id long, text string"
        ).write.parquet(str(src / "f3"))
        run_dedup_ingest(
            self._stream(spark, src), "text", "doc_id", table, str(out)
        )
        got2 = {r["doc_id"] for r in spark.read.parquet(f"{out}/batch=*").collect()}
        # 30 duplicates the already-ingested 'fresh b': rejected
        assert got2 == got | {31}
        spark.sql(f"DROP TABLE IF EXISTS {table}")

    def test_committed_batch_is_never_rewritten(self, spark, tmp_path):
        """The crash-after-doc-write branch: a batch directory carrying
        _SUCCESS must be left intact (a re-computed admission set could
        be a subset once hashes landed) and its hashes re-appended."""
        from gdp_etl_spark.streaming.ingest import run_dedup_ingest

        table = "t_stream_idx2"
        self._setup_index(spark, table)
        src, out = tmp_path / "src", tmp_path / "out"
        src.mkdir()
        spark.createDataFrame(
            [(40, "fresh x"), (41, "fresh y")], "doc_id long, text string"
        ).write.parquet(str(src / "f1"))
        # simulate: docs landed and marker committed, hash append lost
        # (crash) — batch 0 directory pre-exists, index has NO x/y
        pre = spark.createDataFrame(
            [(40, "fresh x"), (41, "fresh y")], "doc_id long, text string"
        )
        pre.write.mode("overwrite").parquet(str(out / "batch=0"))

        run_dedup_ingest(
            self._stream(spark, src), "text", "doc_id", table, str(out)
        )
        # directory intact (not rewritten to a subset), index completed:
        got = {r["doc_id"] for r in spark.read.parquet(str(out / "batch=0")).collect()}
        assert got == {40, 41}
        idx = {r["text_md5"] for r in spark.table(table).collect()}
        from pyspark.sql import functions as F
        want = {
            r["h"]
            for r in pre.select(F.md5("text").alias("h")).collect()
        }
        assert want <= idx
        # and a redelivered doc is now rejected end-to-end
        spark.createDataFrame(
            [(50, "fresh x"), (51, "brand new")], "doc_id long, text string"
        ).write.parquet(str(src / "f2"))
        run_dedup_ingest(
            self._stream(spark, src), "text", "doc_id", table, str(out)
        )
        all_docs = {r["doc_id"] for r in spark.read.parquet(f"{out}/batch=*").collect()}
        assert 51 in all_docs and 50 not in all_docs and 40 in all_docs
        spark.sql(f"DROP TABLE IF EXISTS {table}")


class TestStreamingNearDupIngest:
    """run_near_dup_ingest: both admission screens (exact md5 index +
    MinHash near-dup index) composed into the exactly-once ingest."""

    BASE = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa")
    OTHER = ("one two three four five six seven eight nine ten eleven "
             "twelve thirteen fourteen fifteen sixteen")
    PARAMS = dict(num_perm=16, bands=8, shingle_k=3)

    def _setup_indexes(self, spark, exact, near):
        import shutil

        from gdp_etl_spark.operators.dedup import (
            write_dedup_index,
            write_minhash_index,
        )

        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        for t in (exact, near, f"{near}_sets"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
        corpus = spark.createDataFrame(
            [(1, self.BASE), (2, "unrelated corpus text about parquet "
                                 "buckets and sorted merge joins today")],
            "doc_id long, text string",
        )
        write_dedup_index(corpus, "text", exact, n_buckets=4)
        write_minhash_index(
            corpus, "text", "doc_id", near, n_buckets=4, **self.PARAMS
        )

    def _drop(self, spark, exact, near):
        for t in (exact, near, f"{near}_sets"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    def _stream(self, spark, src):
        return (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )

    def test_both_screens_and_batch_parity(self, spark, tmp_path):
        from gdp_etl_spark.operators.dedup import (
            append_to_dedup_index,
            append_to_minhash_index,
            dedup_against_index,
            near_dup_against_index,
        )
        from gdp_etl_spark.streaming.ingest import run_near_dup_ingest

        exact, near = "t_nd_exact", "t_nd_near"
        self._setup_indexes(spark, exact, near)
        src, out = tmp_path / "src", tmp_path / "out"
        src.mkdir()
        files = [
            [(10, self.BASE),               # exact corpus dup: screen 1
             (11, self.BASE + " zulu"),     # near-dup of corpus: screen 2
             (12, self.OTHER)],             # fresh: admitted
            [(20, self.OTHER + " yankee"),  # near-dup of 12 (admitted in
                                            # batch 1, now indexed): reject
             (21, "a genuinely novel document mentioning watermarks "
                  "checkpoints and exactly once sinks")],  # admitted
        ]
        for i, rows_ in enumerate(files):
            spark.createDataFrame(
                rows_, "doc_id long, text string"
            ).write.parquet(str(src / f"f{i}"))

        run_near_dup_ingest(
            self._stream(spark, src), "text", "doc_id", exact, near,
            str(out), jaccard_threshold=0.5, **self.PARAMS,
        )
        got = {
            r["doc_id"]
            for r in spark.read.parquet(f"{out}/batch=*").collect()
        }
        assert got == {12, 21}

        # batch parity: the same files pushed file-by-file through the
        # operators directly (fresh indexes) admit the same id set
        exact2, near2 = "t_nd_exact2", "t_nd_near2"
        self._setup_indexes(spark, exact2, near2)
        batch_admitted = set()
        for rows_ in files:
            df = spark.createDataFrame(rows_, "doc_id long, text string")
            fresh = dedup_against_index(
                spark, df, "text", "doc_id", exact2
            ).localCheckpoint(eager=True)
            pairs = near_dup_against_index(
                spark, fresh, "text", "doc_id", near2,
                jaccard_threshold=0.5, **self.PARAMS,
            )
            adm = fresh.join(
                pairs.select(F.col("batch_id").alias("doc_id")).distinct(),
                "doc_id",
                "left_anti",
            ).localCheckpoint(eager=True)
            batch_admitted |= {r["doc_id"] for r in adm.collect()}
            append_to_dedup_index(adm, "text", exact2)
            append_to_minhash_index(
                adm, "text", "doc_id", near2, **self.PARAMS
            )
        assert batch_admitted == got
        self._drop(spark, exact, near)
        self._drop(spark, exact2, near2)

    def test_redelivery_completes_all_three_tables(self, spark, tmp_path):
        """Crash after the doc-write, before the index appends: the
        marker-bearing directory is never rewritten and the re-run
        folds its docs into the md5 index AND both MinHash tables, so
        later exact/near copies are rejected end-to-end."""
        from gdp_etl_spark.streaming.ingest import run_near_dup_ingest

        exact, near = "t_nd_exact3", "t_nd_near3"
        self._setup_indexes(spark, exact, near)
        src, out = tmp_path / "src", tmp_path / "out"
        src.mkdir()
        landed = [(40, self.OTHER), (41, "another brand new document "
                                         "about broadcast joins and "
                                         "adaptive query execution")]
        spark.createDataFrame(
            landed, "doc_id long, text string"
        ).write.parquet(str(src / "f1"))
        # simulate the crash window: docs landed (marker present), NO
        # index appends happened
        spark.createDataFrame(
            landed, "doc_id long, text string"
        ).write.mode("overwrite").parquet(str(out / "batch=0"))

        run_near_dup_ingest(
            self._stream(spark, src), "text", "doc_id", exact, near,
            str(out), jaccard_threshold=0.5, **self.PARAMS,
        )
        # directory intact
        got = {
            r["doc_id"]
            for r in spark.read.parquet(str(out / "batch=0")).collect()
        }
        assert got == {40, 41}
        # both screens now see the landed docs: an exact copy AND a
        # near copy are rejected, a fresh doc admits
        spark.createDataFrame(
            [(50, self.OTHER),               # exact copy of 40
             (51, self.OTHER + " xray"),     # near-dup of 40
             (52, "completely distinct closing fixture mentioning "
                  "salting skew and bloom filters")],
            "doc_id long, text string",
        ).write.parquet(str(src / "f2"))
        run_near_dup_ingest(
            self._stream(spark, src), "text", "doc_id", exact, near,
            str(out), jaccard_threshold=0.5, **self.PARAMS,
        )
        all_ids = {
            r["doc_id"]
            for r in spark.read.parquet(f"{out}/batch=*").collect()
        }
        assert 52 in all_ids
        assert 50 not in all_ids and 51 not in all_ids
        self._drop(spark, exact, near)

    def test_within_batch_screen_keeps_cluster_canonical(self, spark, tmp_path):
        """within_batch=True: two mutual near-dups landing in ONE
        micro-batch admit only the cluster canonical (min id); the
        default admits both (corpus-screen-only semantics)."""
        from gdp_etl_spark.streaming.ingest import run_near_dup_ingest

        for flag, expect in ((False, {60, 61, 62}), (True, {60, 62})):
            exact, near = f"t_nd_wb_{int(flag)}", f"t_nd_wbn_{int(flag)}"
            self._setup_indexes(spark, exact, near)
            src, out = tmp_path / f"src{int(flag)}", tmp_path / f"out{int(flag)}"
            src.mkdir()
            # coalesce(1): one part file == one micro-batch — split part
            # files would make this a CROSS-batch case (60 rejected
            # against the just-indexed 61 even without the flag)
            spark.createDataFrame(
                [(61, self.OTHER + " zulu"),   # near-dup of 60, same batch
                 (60, self.OTHER),
                 (62, "a separate standalone document about shuffle "
                      "partitions and broadcast thresholds")],
                "doc_id long, text string",
            ).coalesce(1).write.parquet(str(src / "f1"))
            run_near_dup_ingest(
                self._stream(spark, src), "text", "doc_id", exact, near,
                str(out), jaccard_threshold=0.5, within_batch=flag,
                **self.PARAMS,
            )
            got = {
                r["doc_id"]
                for r in spark.read.parquet(f"{out}/batch=*").collect()
            }
            assert got == expect, (flag, got)
            self._drop(spark, exact, near)

    def test_compaction_mid_cycle_preserves_admissions(self, spark, tmp_path):
        """The full ops cycle: ingest days 1-2, compact ALL THREE index
        tables, ingest day 3 — the compacted indexes must reject
        exact and near copies of everything already admitted, exactly
        as the uncompacted ones would."""
        from gdp_etl_spark.operators.dedup import (
            compact_dedup_index,
            compact_minhash_index,
        )
        from gdp_etl_spark.streaming.ingest import run_near_dup_ingest

        exact, near = "t_nd_cycle_e", "t_nd_cycle_n"
        self._setup_indexes(spark, exact, near)
        src, out = tmp_path / "src", tmp_path / "out"
        src.mkdir()
        spark.createDataFrame(
            [(10, self.OTHER)], "doc_id long, text string"
        ).coalesce(1).write.parquet(str(src / "f1"))
        spark.createDataFrame(
            [(20, "a brand new day two document about watermarks and "
                  "stateful operators")],
            "doc_id long, text string",
        ).coalesce(1).write.parquet(str(src / "f2"))
        run_near_dup_ingest(
            self._stream(spark, src), "text", "doc_id", exact, near,
            str(out), jaccard_threshold=0.5, **self.PARAMS,
        )
        compact_dedup_index(spark, exact)
        compact_minhash_index(spark, near)
        # day 3: exact copy of day-1 doc, near copy of day-2 doc, one new
        spark.createDataFrame(
            [(30, self.OTHER),                      # exact copy: reject
             (31, "a brand new day two document about watermarks and "
                  "stateful operators tail"),        # near copy: reject
             (32, "closing fixture doc mentioning bloom filters and "
                  "dynamic partition pruning")],     # new: admit
            "doc_id long, text string",
        ).coalesce(1).write.parquet(str(src / "f3"))
        run_near_dup_ingest(
            self._stream(spark, src), "text", "doc_id", exact, near,
            str(out), jaccard_threshold=0.5, **self.PARAMS,
        )
        got = {
            r["doc_id"]
            for r in spark.read.parquet(f"{out}/batch=*").collect()
        }
        assert got == {10, 20, 32}
        self._drop(spark, exact, near)


class TestStreamingDecontamScreen:
    """run_near_dup_ingest(benchmark=...): the FOURTH admission screen —
    evaluation-set decontamination composed into the ingest."""

    def test_benchmark_screen_rejects_contaminated(self, spark, tmp_path):
        from gdp_etl_spark.operators.decontam import (
            benchmark_shingle_hashes,
            screen_contaminated,
        )
        from gdp_etl_spark.streaming.ingest import run_near_dup_ingest

        t = TestStreamingNearDupIngest()
        exact, near = "t_nd_exact_dc", "t_nd_near_dc"
        t._setup_indexes(spark, exact, near)
        bench = spark.createDataFrame(
            [(1, "what is the capital of france and where is it located "
                 "on a map of europe exactly")],
            "qid long, text string",
        )
        src, out = tmp_path / "src", tmp_path / "out"
        src.mkdir()
        rows_ = [
            # leaks an 8-gram of the benchmark question: reject
            (30, "trivia dump: what is the capital of france and where "
                 "is it located plus other questions"),
            # clean novel doc: admit
            (31, "a clean document about shuffle partitions and adaptive "
                 "query execution tuning at scale"),
        ]
        spark.createDataFrame(rows_, "doc_id long, text string").write.parquet(
            str(src / "f0")
        )
        run_near_dup_ingest(
            t._stream(spark, src), "text", "doc_id", exact, near,
            str(out), jaccard_threshold=0.5, benchmark=bench,
            **t.PARAMS,
        )
        got = {
            r["doc_id"]
            for r in spark.read.parquet(f"{out}/batch=*").collect()
        }
        assert got == {31}

        # parity with the batch form of the screen
        docs = spark.createDataFrame(rows_, "doc_id long, text string")
        kept = screen_contaminated(
            docs, benchmark_shingle_hashes(bench, "text"), "text", "doc_id"
        )
        assert {r.doc_id for r in kept.collect()} == {31}
        # min_overlap > 1: one shared 8-gram is no longer disqualifying
        kept2 = screen_contaminated(
            docs, benchmark_shingle_hashes(bench, "text"), "text", "doc_id",
            min_overlap=10,
        )
        assert {r.doc_id for r in kept2.collect()} == {30, 31}
        t._drop(spark, exact, near)


def test_crawl_lands_into_streaming_admission(spark, tmp_path):
    """Ops-cycle integration for the CRAWL front door: two WET dumps
    land via wet_to_documents (content-addressed ids) into the ingest
    source dir; run_near_dup_ingest streams them through both
    admission screens.  A re-crawl of the same page text at a NEW URI
    gets a new doc_id but the SAME text — the exact screen must reject
    it; an edited near-copy falls to the MinHash screen; fresh pages
    are admitted.  Proves read_wet → wet_to_documents →
    run_near_dup_ingest compose without adapters."""
    import shutil

    from gdp_etl_spark.plans.corpus import wet_to_documents
    from gdp_etl_spark.streaming.ingest import run_near_dup_ingest

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa")
    other = ("one two three four five six seven eight nine ten eleven "
             "twelve thirteen fourteen fifteen sixteen")
    params = dict(num_perm=16, bands=8, shingle_k=3)

    def wet_rec(uri, body):
        return (
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            "WARC-Date: 2024-03-01T12:00:00Z\r\n"
            f"Content-Length: {len(body.encode())}\r\n"
            "\r\n"
            f"{body}\r\n\r\n"
        )

    dumps = [
        wet_rec("https://a.example/page", base)
        + wet_rec("https://b.example/page", other),
        wet_rec("https://mirror.example/recrawl", base)      # exact text
        + wet_rec("https://b.example/page2", other + " yankee")  # near-dup
        + wet_rec("https://c.example/fresh",
                  "a genuinely novel crawl document mentioning "
                  "watermarks checkpoints and exactly once sinks"),
    ]
    crawl, src, out = tmp_path / "crawl", tmp_path / "src", tmp_path / "out"
    crawl.mkdir()
    src.mkdir()
    for i, dump in enumerate(dumps):
        (crawl / f"dump{i}.wet").write_bytes(dump.encode())
        # the landing stage: one batch job per crawl dump
        wet_to_documents(spark, str(crawl / f"dump{i}.wet")).select(
            "doc_id", "text", "url"
        ).write.parquet(str(src / f"f{i}"))

    exact, near = "t_crawl_exact", "t_crawl_near"
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    from gdp_etl_spark.operators.dedup import (
        write_dedup_index,
        write_minhash_index,
    )

    for t in (exact, near, f"{near}_sets"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    seed = spark.createDataFrame(
        [(1, "unrelated corpus seed text about parquet buckets and "
             "sorted merge joins today")],
        "doc_id long, text string",
    )
    write_dedup_index(seed, "text", exact, n_buckets=4)
    write_minhash_index(seed, "text", "doc_id", near, n_buckets=4, **params)

    stream = (
        spark.readStream.schema("doc_id long, text string, url string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    run_near_dup_ingest(
        stream, "text", "doc_id", exact, near, str(out),
        jaccard_threshold=0.5, **params,
    )
    admitted = {
        r["url"] for r in spark.read.parquet(f"{out}/batch=*").collect()
    }
    assert admitted == {
        "https://a.example/page",
        "https://b.example/page",
        "https://c.example/fresh",
    }
    for t in (exact, near, f"{near}_sets"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
