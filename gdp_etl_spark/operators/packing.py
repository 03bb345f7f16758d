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


def length_bucketed_batches(
    df: DataFrame,
    token_col: str,
    batch_token_budget: int,
    shard_cols: Sequence[str],
    order_cols: Sequence[str],
    bucket_growth: float = 1.25,
) -> DataFrame:
    """Pad-efficiency batching: group documents of SIMILAR length into
    batches whose padded cost (``batch_rows × bucket_max_len``) fits a
    token budget — the standard alternative to concat-packing when
    documents must stay intact (SFT, eval, reward-model scoring), where
    batching by arrival order wastes up to ~50% of compute as padding.

    Buckets are geometric: bucket ``b`` holds lengths in
    ``(g^(b-1), g^b]`` with ``g = bucket_growth``, so padding waste
    within a bucket is bounded by ``1 − 1/g`` (20% at the default 1.25)
    plus at most ONE token of integer-ceiling slack on the cap —
    material only for very short documents (cap 8 for a 6-token doc),
    negligible at training lengths.  Within each
    (shard, bucket), rows order deterministically and chop into batches
    of ``floor(budget / bucket_cap)`` rows — a row_number window per
    (shard, bucket), the same shape as :func:`pack_sequences`.

    Output: ``length_bucket`` (int), ``bucket_cap`` (int, the padded
    length), ``batch_id`` (bigint, per shard+bucket), ``batch_slot``
    (position inside the batch).  Documents longer than the budget
    raise at runtime (they can never batch; truncate or split first).

    Scale shape: one window shuffle on (shard, bucket) — no global
    sort; bucket arithmetic is pure map work.  Deterministic across
    partitionings by the same argument as pack_sequences.
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty (deterministic order)")
    if bucket_growth <= 1.0:
        raise ValueError("bucket_growth must be > 1")
    n = F.col(token_col).cast("double")
    guard = F.when(
        F.col(token_col) > batch_token_budget,
        F.raise_error(
            F.format_string(
                f"length_bucketed_batches: document of %s tokens exceeds "
                f"the batch budget {batch_token_budget}; truncate or "
                f"split first",
                F.col(token_col).cast("string"),
            )
        ),
    ).otherwise(F.lit(1))
    # bucket 0: empty docs; bucket b>=1: lengths in (g^(b-1), g^b]
    import math

    lg = math.log(bucket_growth)
    bucket = F.when(n <= 1, F.lit(0)).otherwise(
        F.ceil(F.log(n) / F.lit(lg)).cast("int")
    )
    with_bucket = (
        df.filter(guard == F.lit(1))
        .withColumn("length_bucket", bucket)
        .withColumn(
            "bucket_cap",
            F.least(
                F.lit(batch_token_budget),
                F.ceil(
                    F.pow(F.lit(bucket_growth), F.col("length_bucket"))
                ).cast("int"),
            ),
        )
    )
    rows_per_batch = (
        F.lit(batch_token_budget) / F.col("bucket_cap")
    ).cast("bigint")
    w = Window.partitionBy(
        *[F.col(c) for c in shard_cols], F.col("length_bucket")
    ).orderBy(*[F.col(c) for c in order_cols])
    rn = F.row_number().over(w) - 1
    return with_bucket.withColumn(
        "batch_id", F.floor(rn / rows_per_batch)
    ).withColumn("batch_slot", rn % rows_per_batch)


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    size: int,
    stride: int | None = None,
    min_tokens: int = 1,
) -> DataFrame:
    """Sliding-window chunking: one row per (document, chunk), where
    chunk ``i`` covers whitespace tokens ``[i*stride, i*stride + size)``
    of the document.  ``stride < size`` gives overlapping chunks (the
    RAG / embedding-indexing shape); ``stride == size`` (the default)
    gives disjoint chunks.  Unlike :func:`pack_sequences` (which
    concatenates ACROSS documents), chunking is strictly per-document.

    Output: ``id_col``, ``chunk_id`` (0-based int), ``chunk_text``
    (tokens re-joined with single spaces), ``chunk_tokens`` (int).
    Chunk starts are every multiple of ``stride`` in ``[0, n_tokens)``,
    so trailing chunks may be shorter than ``size``; chunks with fewer
    than ``min_tokens`` tokens are dropped (empty/NULL docs therefore
    produce no rows).

    Scale shape: map-only — tokenize, per-row ``sequence`` of starts,
    ``posexplode``, per-chunk ``slice`` + ``array_join``.  Zero
    shuffles, zero Python; the ~size/stride row fan-out happens inside
    one whole-stage-codegen pipeline, and downstream consumers
    (embedding, indexing) inherit the input's partitioning."""
    if size <= 0:
        raise ValueError("size must be positive")
    stride = size if stride is None else stride
    if stride <= 0:
        raise ValueError("stride must be positive")
    if min_tokens < 1:
        raise ValueError("min_tokens must be >= 1")
    from gdp_etl_spark.functions.text import ws_tokens

    toks = ws_tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    # Build the finished chunk structs in ONE projection expression and
    # explode the result, so the tokenize runs once per document (codegen
    # subexpression elimination applies within a single Project) instead
    # of being re-inlined into Generate + Filter + Project separately.
    chunks = F.filter(
        F.transform(
            starts,
            lambda s, i: F.struct(
                i.cast("int").alias("chunk_id"),
                F.array_join(F.slice(toks, s + 1, size), " ").alias("chunk_text"),
                F.least(F.lit(size), n - s).cast("int").alias("chunk_tokens"),
            ),
        ),
        lambda c: c["chunk_tokens"] >= F.lit(min_tokens),
    )
    return df.select(F.col(id_col), F.explode(chunks).alias("__c")).select(
        id_col, "__c.*"
    )
