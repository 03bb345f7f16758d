"""CDC change-log application — fold an out-of-order stream of
insert/update/delete events into a snapshot (the ``APPLY CHANGES INTO``
/ Debezium-consumer pattern; reference analogue: the release-refresh
the GDP pipeline performs by full reload, re-expressed incrementally).

Two halves, both pure DataFrame ops:

* :func:`latest_changes` — validate every event (non-NULL keys, known
  op), then per key keep only the LAST event by (sequence, tie-break)
  — one partitioned window shuffle.  CDC feeds deliver at-least-once
  and out of order; everything before the latest event per key is
  superseded by definition.
* :func:`apply_changes` — merge the compacted batch into the snapshot:
  upserts overwrite, deletes drop, unmatched snapshot rows carry over —
  one co-partitioned full-outer join over the shared
  ``merge.presence_merge`` skeleton (the same shuffle a bucketed
  target makes free).

Scale shape: the window and the join key on the SAME columns, so one
hash partitioning serves both stages (no extra exchange between them —
pinned by a plan test); row logic is column expressions only — no UDF,
no driver state.  Skewed hot keys (one entity updated millions of
times per batch) hit the window compaction, which is exactly where AQE
skew-split applies; the join side sees at most one row per key
afterwards.

Determinism: ties on ``seq_col`` break by ``op`` precedence
(delete > upsert — a delete and an update carrying the same sequence
number resolve to the delete, the conservative reading), then by a
content hash over ALL columns, so the survivor is a pure function of
the input rows — independent of partitioning and input order (which is
what makes the DuckDB oracle replayable and the streaming sink's
redelivery idempotent).  Malformed events (NULL key, NULL/unknown op)
raise at runtime BEFORE compaction, so a superseded bad event still
surfaces the producer bug instead of being silently discarded.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: recognised op codes; anything else raises at runtime
OPS = ("insert", "update", "delete")


def _validated(
    changes: DataFrame, keys: Sequence[str], op_col: str
) -> DataFrame:
    """Raise (executor-side, via a filter so pruning can't skip it) on
    NULL keys or NULL/unknown ops — BEFORE compaction, so every event
    is checked, not just the per-key survivor.  Three-valued logic
    matters here: a NULL op fails ``isin`` with NULL, not false, so
    the guard tests NULLs explicitly."""
    op = F.col(op_col)
    null_key = None
    for k in keys:
        nk = F.col(k).isNull()
        null_key = nk if null_key is None else (null_key | nk)
    bad = null_key | op.isNull() | ~op.isin(*OPS)
    guard = F.when(
        bad,
        F.raise_error(
            F.format_string(
                "cdc: malformed change event (keys %s, op %s) — keys "
                "must be non-NULL and op one of "
                + "/".join(OPS),
                F.concat_ws(",", *[F.col(k).cast("string") for k in keys]),
                F.coalesce(op.cast("string"), F.lit("NULL")),
            )
        ),
    ).otherwise(F.lit(1))
    return changes.filter(guard == F.lit(1))


def latest_changes(
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Compact a change log to the latest event per key.

    Ordering: ``seq_col`` descending, delete-beats-upsert on equal
    sequence numbers, then a content hash over every column — a total
    order, so the survivor is well-defined for ANY input order and
    partitioning (two fully identical rows tie, and either is the same
    survivor).  One window over the key partitioning.  Every event is
    validated first (see module docstring).
    """
    keys = list(keys)
    checked = _validated(changes, keys, op_col)
    op_rank = F.when(F.col(op_col) == "delete", 1).otherwise(0)
    content = F.xxhash64(*[F.col(c) for c in changes.columns])
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(), op_rank.desc(), content.desc()
    )
    return (
        checked.withColumn("__rn", F.row_number().over(w))
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
    from .merge import presence_merge

    keys = list(keys)
    if value_cols is None:
        value_cols = [c for c in snapshot.columns if c not in keys]
    latest = latest_changes(changes, keys, seq_col, op_col)
    j, _t_present, s_present, key_select, value_select = presence_merge(
        snapshot, latest, keys, value_cols
    )
    # ops were validated pre-compaction, so the only filter needed is
    # the delete drop; eqNullSafe keeps snapshot-only rows (NULL op)
    return j.filter(
        ~(s_present & F.col(f"s.{op_col}").eqNullSafe(F.lit("delete")))
    ).select(*key_select, *value_select)
