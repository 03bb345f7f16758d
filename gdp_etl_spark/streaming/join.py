"""Watermarked stream-stream join: event attribution.

The last structural streaming pattern beyond windowed aggregation /
dedup / stream-static enrichment: joining two *unbounded* sides.
Spark requires watermarks on both inputs plus a time-range join
condition so each side's buffered state can be evicted once the other
side's watermark passes the range — state is O(events per horizon),
never O(history).

The concrete operator is click→purchase attribution: every (click,
purchase) pair for one user where the purchase follows the click within
``max_lag`` — the streaming twin of the batch ``range_join`` query
(point-in-interval semantics, same join shape Catalyst plans for the
batch side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_purchases(
    events: DataFrame,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Join each ``purchase`` to every preceding ``click`` by the same
    user within ``max_lag``.  Works on a streaming OR batch events frame
    (watermarks are no-ops in batch — the parity tests exploit that).

    Returns (user_id, click_id, click_ts, purchase_id, purchase_ts).
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = purchases.join(
        clicks,
        F.expr(
            f"""p_user_id = user_id
                AND click_ts <= purchase_ts
                AND click_ts >= purchase_ts - INTERVAL {max_lag}"""
        ),
        "inner",
    )
    return joined.select(
        "user_id", "click_id", "click_ts", "purchase_id", "purchase_ts"
    )


def attribute_purchases_outer(
    events: DataFrame,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Left-outer variant: every click appears, purchase columns NULL
    when no purchase followed within ``max_lag``.

    The semantic difference from the inner join is *when* the NULL rows
    can be emitted: only once the watermark passes a click's join
    horizon can the engine prove no matching purchase will arrive, so
    unmatched clicks surface with watermark delay — the test drives a
    multi-batch file source to force exactly that transition.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = clicks.join(
        purchases,
        F.expr(
            f"""p_user_id = user_id
                AND purchase_ts >= click_ts
                AND purchase_ts <= click_ts + INTERVAL {max_lag}"""
        ),
        "left_outer",
    )
    return joined.select(
        "user_id", "click_id", "click_ts", "purchase_id", "purchase_ts"
    )
