"""Custom stateful streaming operator via ``applyInPandasWithState``.

``running_user_stats`` maintains per-key running aggregates (event count,
value sum, last-seen timestamp) across micro-batches with an idle
timeout: a key that stays silent for ``idle_timeout_ms`` of processing
time emits a final "expired" row and its state is dropped — the pattern
for session-finalization, abandoned-cart, and device-offline semantics
that ``session_window`` alone can't express.

State is one tiny tuple per key (bounded memory, checkpointed by the
state store); each micro-batch update is Arrow-batched per key group.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_seen_us", LongType()),
        StructField("status", StringType()),  # "active" | "expired"
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_seen_us", LongType()),
    ]
)


def _make_update(idle_timeout_ms: int):
    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, total, last = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [total],
                    "last_seen_us": [last],
                    "status": ["expired"],
                }
            )
            return
        n, total, last = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            last = max(last, int(pdf["ts_us"].max()))
        state.update((n, total, last))
        if idle_timeout_ms > 0:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "last_seen_us": [last],
                "status": ["active"],
            }
        )

    return update


def running_user_stats(
    events: DataFrame, idle_timeout_ms: int = 60_000
) -> DataFrame:
    """Streaming per-user running stats with idle-timeout finalization.

    ``events`` must carry ``user_id, value, ts_us`` (e.g.
    :func:`gdp_etl_spark.streaming.stream_events` plus a
    ``unix_micros(ts)`` projection).

    ``idle_timeout_ms <= 0`` disables expiry (``NoTimeout``).  Note:
    Spark 4.1.2 has an internal planner bug (NPE in PythonSQLMetrics)
    when a ProcessingTimeTimeout batch is re-planned under the
    ``availableNow`` trigger; with a real micro-batch trigger the
    timeout path is fine, and parity tests use the NoTimeout path."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update(idle_timeout_ms),
        outputStructType=STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
