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
