"""Streaming/batch parity: replay the events parquet through the
file-stream source and assert the windowed results equal the batch ones."""

import pytest
from pyspark.sql import functions as F

from gdp_etl_spark.operators.sessions import session_stats
from gdp_etl_spark.streaming import (
    run_available_now_to_memory,
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
