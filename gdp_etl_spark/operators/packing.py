"""Sequence packing: assign documents to fixed-token-budget training
sequences (concat-then-chunk semantics).

Training pipelines concatenate the token stream in a deterministic
order and cut it into fixed-length sequences; each document is tagged
with the sequence its first token lands in and its offset there.  That
formulation is a pure running-sum window — exactly SQL-expressible
(unlike best-fit bin packing, which is order-dependent and
non-relational) and embarrassingly parallel when packing is scoped
per shard.

Scale shape: ONE window per shard (partitionBy shard columns) — no
global ordering, no single-partition bottleneck.  Shards are whatever
the training layout already groups by (language, domain, date bucket);
a corpus with no natural shard can use a hash bucket column.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    shard_cols: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """``df`` + ``seq_id`` (per-shard sequence number containing the
    doc's first token) + ``seq_offset`` (token offset inside it).

    ``order_cols`` must be a deterministic total order within each shard
    (an id column) — reproducibility of the packing IS the point."""
    if not order_cols:
        raise ValueError("order_cols must be non-empty (deterministic order)")
    w = (
        Window.partitionBy(*[F.col(c) for c in shard_cols])
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(F.col(token_col)).over(w) - F.col(token_col)).cast("bigint")
    return df.withColumn(
        "seq_id", F.floor(start / F.lit(float(budget)))
    ).withColumn("seq_offset", start % F.lit(budget))
