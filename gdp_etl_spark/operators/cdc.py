"""CDC change-log application — fold an out-of-order stream of
insert/update/delete events into a snapshot (the ``APPLY CHANGES INTO``
/ Debezium-consumer pattern; reference analogue: the release-refresh
the GDP pipeline performs by full reload, re-expressed incrementally).

Two halves, both pure DataFrame ops:

* :func:`latest_changes` — per key, keep only the LAST event by
  (sequence, tie-break) — one partitioned window shuffle.  CDC feeds
  deliver at-least-once and out of order; everything before the latest
  event per key is superseded by definition.
* :func:`apply_changes` — merge the compacted batch into the snapshot:
  upserts overwrite, deletes drop, unmatched snapshot rows carry over —
  one co-partitioned full-outer join (the same shuffle a bucketed
  target makes free).

Scale shape: the window and the join key on the SAME columns, so one
hash partitioning serves both stages (no extra exchange between them);
row logic is column expressions only — no UDF, no driver state.  Skewed
hot keys (one entity updated millions of times per batch) hit the
window compaction, which is exactly where AQE skew-split applies; the
join side sees at most one row per key afterwards.

Determinism: ties on ``seq_col`` break by ``op`` precedence
(delete > upsert, i.e. a delete and an update carrying the same
sequence number resolve to the delete — the conservative reading) and
the result is independent of partitioning and input order, which is
what makes the DuckDB oracle replayable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: recognised op codes; anything else raises at plan time
OPS = ("insert", "update", "delete")


def latest_changes(
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Compact a change log to the latest event per key.

    Ordering: ``seq_col`` descending, then delete-beats-upsert on equal
    sequence numbers, so the survivor is well-defined for any input
    order.  One window over the key partitioning.
    """
    keys = list(keys)
    # delete ranks above insert/update at the same sequence number
    op_rank = F.when(F.col(op_col) == "delete", 1).otherwise(0)
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(), op_rank.desc()
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Next snapshot = ``snapshot`` + compacted ``changes``.

    * key only in changes, op insert/update → row appears with the
      change's values;
    * key in both, op insert/update → change's values win (including
      explicit NULLs — presence-gated, not coalesce);
    * op delete → key absent from the result;
    * key only in snapshot → carried over unchanged.

    Returns the snapshot schema (keys + value columns) — no audit
    column; use :func:`gdp_etl_spark.operators.merge.merge_upsert` when
    the per-row change class matters more than the delete semantics.
    """
    keys = list(keys)
    if value_cols is None:
        value_cols = [c for c in snapshot.columns if c not in keys]
    latest = latest_changes(changes, keys, seq_col, op_col)
    s, c = snapshot.alias("s"), latest.alias("c")
    from functools import reduce

    cond = reduce(
        lambda a, b: a & b, [F.col(f"s.{k}") == F.col(f"c.{k}") for k in keys]
    )
    j = s.join(c, cond, "full_outer")
    c_present = F.col(f"c.{keys[0]}").isNotNull()
    op = F.col(f"c.{op_col}")
    bad_op = c_present & ~op.isin(*OPS)
    guarded_op = F.when(
        bad_op,
        F.raise_error(
            F.format_string("apply_changes: unknown op %s", op)
        ),
    ).otherwise(op)
    return (
        j.withColumn("__op", guarded_op)
        .filter(~(c_present & (F.col("__op") == "delete")))
        .select(
            *[
                F.coalesce(F.col(f"c.{k}"), F.col(f"s.{k}")).alias(k)
                for k in keys
            ],
            # presence-gated: an update that sets a value to NULL wins
            *[
                F.when(c_present, F.col(f"c.{v}"))
                .otherwise(F.col(f"s.{v}"))
                .alias(v)
                for v in value_cols
            ],
        )
    )
