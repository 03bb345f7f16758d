"""Snapshot merge (upsert) — the incremental-ETL primitive: fold a
change batch into a target snapshot in one full-outer join, emitting the
next snapshot plus a per-row change audit.

Scale shape: one shuffle keyed on the merge keys for each side (the
same co-partitioning a bucketed target table would make free); row-level
logic is pure column expressions — no UDF, no driver loop.  The
classification mirrors what table formats (Delta/Iceberg MERGE) do
underneath, expressed as a plain DataFrame op so the engine needs no
table-format dependency.

Related: ``operators.diff.release_diff`` classifies *discrepancies* for
QA; this operator *applies* the change batch.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def presence_merge(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
):
    """The full-outer presence-gated merge skeleton shared by
    :func:`merge_upsert` and ``operators.cdc.apply_changes``: join on
    the keys, expose presence flags, and build the standard output
    columns — coalesced keys plus presence-gated values (a source row
    that sets a value to NULL must WIN; coalesce would resurrect the
    old value).

    Returns ``(joined, t_present, s_present, key_select, value_select)``
    so callers layer their own semantics (change audit, delete filter)
    on top without re-implementing the NULL logic."""
    t, s = target.alias("t"), source.alias("s")
    cond = reduce(
        lambda a, b: a & b, [F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys]
    )
    j = t.join(s, cond, "full_outer")
    t_present = F.col(f"t.{keys[0]}").isNotNull()
    s_present = F.col(f"s.{keys[0]}").isNotNull()
    key_select = [
        F.coalesce(F.col(f"s.{k}"), F.col(f"t.{k}")).alias(k) for k in keys
    ]
    value_select = [
        F.when(s_present, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in value_cols
    ]
    return j, t_present, s_present, key_select, value_select


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Full-outer merge of ``source`` (wins on conflict) into ``target``.

    Returns the merged snapshot: key columns, value columns
    (source-precedence coalesce), and ``change`` ∈
    {'insert','update','delete','unchanged'} — 'delete' rows are keys
    present only in the target; callers drop or retain them by policy.
    Value comparison is null-safe (NULL → value is an update, value →
    NULL is an update, NULL → NULL is not).
    """
    if value_cols is None:
        value_cols = [c for c in target.columns if c not in keys]
    j, t_present, s_present, key_select, value_select = presence_merge(
        target, source, keys, value_cols
    )
    differs = reduce(
        lambda a, b: a | b,
        [~F.col(f"t.{c}").eqNullSafe(F.col(f"s.{c}")) for c in value_cols],
    )
    change = (
        F.when(~t_present, F.lit("insert"))
        .when(~s_present, F.lit("delete"))
        .when(differs, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(*key_select, *value_select, change.alias("change"))
