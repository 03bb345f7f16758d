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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


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
