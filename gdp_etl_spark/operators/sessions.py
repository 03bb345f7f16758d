"""Sessionization over event streams (batch form).

Gap-based sessions: a new session starts when the gap to the previous
event of the same key exceeds ``gap_seconds``.  Classic lag + running
sum — one shuffle on the session key (the window partition), everything
else is JVM-side.  Comparisons use exact microsecond integers
(``unix_micros``), never float epoch seconds, so boundaries are
deterministic across engines.

The streaming equivalent lives in ``gdp_etl_spark.streaming`` (same
semantics via ``session_window``); this batch form is what the driver's
``events`` parquet exercises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_tiebreak: str | None = None,
    out_col: str = "session_id",
) -> DataFrame:
    """Append a 0-based per-key session id.

    ``order_tiebreak`` breaks ordering ties for equal timestamps (pass a
    unique column for full determinism)."""
    order = [ts_col] + ([order_tiebreak] if order_tiebreak else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    gap_us = F.lit(int(gap_seconds) * 1_000_000)
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev.isNull() | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, (running - F.lit(1)).cast("bigint"))


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-session aggregates: bounds, duration (seconds, exact micros
    arithmetic), event count."""
    s = sessionize(df, key_col, ts_col, gap_seconds, order_tiebreak)
    return s.groupBy(key_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col)))
            / F.lit(1_000_000.0)
        ).alias("duration_sec"),
        F.count(F.lit(1)).alias("n_events"),
    )
