"""Custom stateful streaming operators.

Two generations of the same capability, both covered:

* ``running_user_stats`` — the ``applyInPandasWithState`` API: per-key
  running aggregates (event count, value sum, last-seen timestamp)
  across micro-batches with an idle timeout: a key that stays silent
  for ``idle_timeout_ms`` of processing time emits a final "expired"
  row and its state is dropped — the pattern for session-finalization,
  abandoned-cart, and device-offline semantics that ``session_window``
  alone can't express.
* ``event_type_counts`` — the Spark 4 ``transformWithStateInPandas``
  API (the arbitrary-stateful-processing successor): a
  :class:`StatefulProcessor` holding a typed **MapState**
  (event_type → count) per user, emitting updated counts per
  micro-batch.  Typed composite state (Value/List/Map + timers) is
  what the old API's single-tuple GroupState could not express.

State is bounded per key (one tuple, resp. one map entry per distinct
event type), checkpointed by the state store; every update is
Arrow-batched per key group.
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


COUNTS_SCHEMA = "user_id bigint, event_type string, n bigint"


def event_type_counts(events: DataFrame) -> DataFrame:
    """Per-(user, event type) running counts via the Spark 4
    ``transformWithStateInPandas`` API.

    The processor keeps one **MapState** per user keyed by event type;
    each micro-batch folds the Arrow-batched rows into the map and
    emits the updated (user_id, event_type, n) tuples — only the types
    seen in the batch, so output volume tracks input volume, not state
    size.  ``events`` must carry ``user_id, event_type``.

    The per-user state is bounded by the event-type cardinality (small
    by construction); the state store checkpoints and restores it
    across restarts, and Update output mode downstream-merges cleanly
    into an idempotent keyed sink (see streaming/sink.py).

    Runtime requirements (optional-dep gated, like the Excel source):
    the ``transformWithState`` Python state-server protocol needs
    ``protobuf``, and the operator needs the RocksDB state store
    (``spark.sql.streaming.stateStore.providerClass =
    ...RocksDBStateStoreProvider`` on the session).  Environments
    without protobuf get a clear ImportError here instead of a crashed
    streaming worker mid-query; the parity test skips itself.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as ex:  # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(its Python state-server protocol is protobuf-encoded); "
            "pip install protobuf, or use running_user_stats "
            "(applyInPandasWithState) which has no such dependency"
        ) from ex
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _TypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "counts", "event_type string", "n bigint"
            )

        def handleInputRows(self, key, rows, timer_values):
            (user_id,) = key
            delta: dict[str, int] = {}
            for pdf in rows:
                for et, n in pdf.groupby("event_type").size().items():
                    delta[et] = delta.get(et, 0) + int(n)
            out_et: list[str] = []
            out_n: list[int] = []
            for et, n in delta.items():
                cur = self._counts.getValue((et,))
                total = (cur[0] if cur else 0) + n
                self._counts.updateValue((et,), (total,))
                out_et.append(et)
                out_n.append(total)
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out_et),
                    "event_type": out_et,
                    "n": out_n,
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        _TypeCounts(),
        outputStructType=COUNTS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
