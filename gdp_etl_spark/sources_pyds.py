"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a deterministic synthetic tick feed with PARTITION-PARALLEL reads.

Demonstrates the engine's newest extension point — a pure-Python
batch source that Spark schedules like any file scan: ``partitions()``
declares the split set, each executor task calls ``read(partition)``
for its split only, and the returned iterator streams Arrow batches.
At scale the source parallelizes across the cluster exactly like a
parquet directory; nothing funnels through the driver.

The feed itself is reproducible synthetic data (xorshift-free integer
recurrence on the global row index), so an oracle can regenerate every
row from ``generate_series`` — the source is testable end-to-end, not
just smoke-checked.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _TickPartition(InputPartition):
    def __init__(self, index: int, start: int, end: int):
        self.index = index
        self.start = start
        self.end = end


class TickFeedReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self):
        per = -(-self.n_rows // self.n_parts)  # ceil
        return [
            _TickPartition(i, i * per, min((i + 1) * per, self.n_rows))
            for i in range(self.n_parts)
            if i * per < self.n_rows
        ]

    def read(self, partition):
        # deterministic per-row values derived only from the global row
        # index — identical whatever the partition count
        for i in range(partition.start, partition.end):
            price = ((i * 2654435761) % 100_000) / 100.0
            side = "B" if (i * 40503) % 7 < 4 else "S"
            yield (i, f"SYM{i % 23}", price, side)


class TickFeedDataSource(DataSource):
    """``spark.read.format("tick_feed").option("rows", N)`` after
    ``spark.dataSource.register(TickFeedDataSource)``."""

    @classmethod
    def name(cls):
        return "tick_feed"

    def schema(self):
        return "tick_id bigint, symbol string, price double, side string"

    def reader(self, schema):
        return TickFeedReader(self.options)

    def streamReader(self, schema):
        return TickFeedStreamReader(self.options)


try:  # DataSourceStreamReader: pyspark >= 4 (same module)
    from pyspark.sql.datasource import DataSourceStreamReader
except ImportError:  # pragma: no cover - env-dependent
    DataSourceStreamReader = object


class TickFeedStreamReader(DataSourceStreamReader):
    """Offset-tracked STREAMING reader for the same tick feed: each
    micro-batch advances the offset by ``rows_per_batch`` until
    ``rows`` is exhausted.  Spark checkpoints the JSON offset and calls
    ``partitions(start, end)`` per batch; splits replay executor-side
    exactly like the batch reader.

    Restart safety: a fresh reader instance starts with ``_current=0``
    while the CHECKPOINT may already be far ahead — so ``_current`` is
    re-synced to every offset the engine hands back (``partitions``
    start/end during replay, ``commit`` after a batch).  ``latestOffset``
    therefore never regresses below the checkpointed position and a
    restarted query resumes without re-emitting; ``partitions`` also
    returns no splits for an empty/inverted range, so a stale
    pre-sync ``latestOffset`` can never produce data.  Rows are a pure
    function of the global index, which is what makes stream==batch
    parity (and the restart test) exact."""

    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.per_batch = int(options.get("rowsPerBatch", 300))
        self.n_parts = int(options.get("partitions", 4))
        self._current = 0

    def initialOffset(self):
        return {"offset": 0}

    def latestOffset(self):
        self._current = min(self._current + self.per_batch, self.n_rows)
        return {"offset": self._current}

    def partitions(self, start, end):
        lo, hi = start["offset"], end["offset"]
        # re-sync after restart: the engine's offsets are authoritative
        self._current = max(self._current, lo, hi)
        if hi <= lo:
            return []
        per = max(1, -(-(hi - lo) // self.n_parts))
        return [
            _TickPartition(i, lo + i * per, min(lo + (i + 1) * per, hi))
            for i in range(self.n_parts)
            if lo + i * per < hi
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            price = ((i * 2654435761) % 100_000) / 100.0
            side = "B" if (i * 40503) % 7 < 4 else "S"
            yield (i, f"SYM{i % 23}", price, side)

    def commit(self, end):
        self._current = max(self._current, end["offset"])
