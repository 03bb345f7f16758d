"""As-of (most-recent-match) join — an operator Spark's DataFrame API
lacks natively, built as a composition of existing ops (the brief's
preferred strategy): no UDF, no range-explode, ONE shuffle.

Semantics: for every left row, attach the right row with the greatest
``right_ts <= left_ts`` within the same key group (ties: the right row
at the exact timestamp matches).  This is DuckDB/kdb ``ASOF JOIN`` and
pandas ``merge_asof`` semantics — the oracle uses DuckDB's native
``ASOF LEFT JOIN``.

Plan shape (the merge-pattern): union both sides with a side marker,
one window sorted by (ts, side) per key carrying the latest right-row
payload forward, then keep left rows.  Cost = one hash shuffle on the
key + a sort within partitions — identical asymptotics to a sort-merge
join, and far cheaper than the naive "join all earlier rows then
row_number" (which explodes before it filters).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the latest ``right``
    payload (``value_cols`` + the matched timestamp as
    ``{right_ts}{suffix}``) with ``right_ts <= left_ts``; NULLs when no
    earlier right row exists."""
    on = list(on)
    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in value_cols]
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("__evt_ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    l = left.withColumn("__evt_ts", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    ).withColumn("__payload", F.lit(None).cast(r.schema["__payload"].dataType))

    # right rows (side 0) sort before left rows at equal timestamps, so
    # an exact-timestamp right row is visible to its left twin
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__evt_ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__last", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1).select(
        *[c for c in left.columns],
        F.col("__last.__ts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__last.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out
