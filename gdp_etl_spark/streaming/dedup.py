"""Streaming ingest dedup and stream-static enrichment.

The two remaining patterns every unbounded ingest pipeline needs beyond
windowed aggregation:

* **Exactly-once-by-key dedup** — at-least-once sources (Kafka, file
  drops, retried uploads) re-deliver; ``dropDuplicatesWithinWatermark``
  keeps one row per key while holding key state only inside the
  watermark horizon, so state is O(keys per horizon), not O(history).
  (Plain ``dropDuplicates`` on a stream never evicts — unbounded state.)
* **Stream-static enrichment** — joining each micro-batch against a
  dimension table.  The static side is broadcast: no shuffle of the
  stream, and the dimension is re-resolved per micro-batch so slowly
  changing dims are picked up on file refresh.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_within_watermark(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """One row per ``keys`` among deliveries arriving within the
    watermark horizon of each other (the re-delivery window of any real
    at-least-once source is minutes, not the full stream history)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def enrich_with_static(
    events: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static join with an explicitly broadcast dimension: each
    micro-batch maps over the broadcast table — the stream side is never
    shuffled."""
    return events.join(F.broadcast(dim), on=on, how=how)
