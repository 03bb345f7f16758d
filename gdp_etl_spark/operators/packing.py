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
    # NULL token counts must raise like over-budget ones do: NULL >
    # budget is NULL -> otherwise(1), so an unguarded NULL would slip
    # through into a NULL bucket whose cap silently becomes the whole
    # budget (least() skips NULLs) — one full-budget batch per NULL doc
    # (self-review finding)
    guard = F.when(
        F.col(token_col).isNull()
        | (F.col(token_col) > batch_token_budget),
        F.raise_error(
            F.format_string(
                f"length_bucketed_batches: document of %s tokens cannot "
                f"batch under budget {batch_token_budget} (NULL or "
                f"over-budget); clean or truncate first",
                F.coalesce(
                    F.col(token_col).cast("string"), F.lit("NULL")
                ),
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
    from gdp_etl_spark.functions.hof import bind_once
    from gdp_etl_spark.functions.text import ws_tokens

    # Tokenize ONCE per row: bind_once hands the token array to the
    # chunk builder as a lambda VARIABLE — a captured `toks` subtree
    # would re-split the text per CHUNK inside the interpreted
    # higher-order lambda (and CollapseProject re-inlines a projected
    # column the same way) — and build the finished chunk structs in
    # ONE expression, exploded after.
    def _chunks(ts):
        n = F.size(ts)
        starts = F.when(
            n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
        ).otherwise(F.array().cast("array<int>"))
        return F.filter(
            F.transform(
                starts,
                lambda s, i: F.struct(
                    i.cast("int").alias("chunk_id"),
                    F.array_join(F.slice(ts, s + 1, size), " ").alias("chunk_text"),
                    F.least(F.lit(size), n - s).cast("int").alias("chunk_tokens"),
                ),
            ),
            lambda c: c["chunk_tokens"] >= F.lit(min_tokens),
        )

    chunks = bind_once(ws_tokens(F.col(text_col)), _chunks)
    return df.select(F.col(id_col), F.explode(chunks).alias("__c")).select(
        id_col, "__c.*"
    )


def pack_segments(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    seq_len: int,
    epoch: int = 0,
    seed: str = "pack",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic sequence packing for pretraining batches — the
    GPT-style concat-then-split layout: documents are laid end to end
    in a reproducible shuffled order and the token stream is cut into
    fixed ``seq_len`` windows, so every training sequence is exactly
    full (zero padding waste) and documents may SPAN pack boundaries
    (the attention mask, not the packer, handles the seam).  The
    missing serving step between
    :func:`~gdp_etl_spark.operators.sampling.epoch_shuffle` (which
    orders and shards documents) and the trainer, which consumes
    fixed-length sequences.

    Contrast with :func:`pack_sequences` above: that operator tags
    each document with the sequence its FIRST token lands in, scoped
    per caller-provided shard (one window per shard — a dominant
    shard pins one task), and cannot say which later packs a long
    document occupies.  This one is global (no natural shard
    required, skew immaterial by construction) and emits the actual
    SPANNING segments — the physical layout a sequence materializer
    needs.

    One output row per (document, pack) SEGMENT:

    * ``pack_id`` — which ``seq_len``-token training sequence;
    * ``doc_offset`` — the segment's first token's offset inside the
      document (0 unless the document was cut by an earlier pack);
    * ``pack_offset`` — where the segment starts inside the pack;
    * ``seg_tokens`` — segment length; a document's segments are
      contiguous and sum to its token count, every pack except the
      last sums to exactly ``seq_len``.

    The order is the portable md5 fold of (id : epoch : seed) — the
    same independent-permutation-per-epoch rule as
    :func:`~gdp_etl_spark.operators.sampling.epoch_shuffle` — and
    every derived number is pure integer
    arithmetic on that order, so the whole layout replays bit-exactly
    in any engine (oracle: one window cumsum + ``range`` unnest).

    Scale shape: the global token-offset cumsum is the two-pass
    prefix-sum of :func:`~gdp_etl_spark.operators.ids.assign_row_ids`
    with TOKEN sums instead of row counts — ``repartitionByRange`` on
    the hash (uniform by construction), per-partition token totals
    (one row per partition, statistics-scale), prefix-summed offsets
    broadcast back, local window inside each partition.  No
    single-partition global window ever materializes; the explode adds
    ``ceil(doc_tokens / seq_len)`` rows per document, which is the
    output's intrinsic size.  Zero-token documents are dropped (they
    occupy no stream positions); ``floor`` on the double quotient is
    exact for any corpus below 2^53 tokens (true-integer quotients of
    exactly-representable operands round exactly).
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    clashes = {"pack_id", "doc_offset", "pack_offset", "seg_tokens",
               "__h", "__pid", "__off", "__begin", "__end"} & set(df.columns)
    if clashes:
        raise ValueError(
            f"pack_segments output columns collide with input columns "
            f"{sorted(clashes)}; rename or drop them first"
        )
    fold = f"{epoch}:{seed}"
    h = F.md5(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(fold))
    )
    base = (
        df.filter(F.col(n_tokens_col) > 0)
        .select(F.col(id_col), F.col(n_tokens_col).cast("long").alias("__nt"))
        .withColumn("__h", h)
    )
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = base.repartitionByRange(n, F.col("__h"), F.col(id_col))
    # one materialization of the range partitioning — see assign_row_ids:
    # boundaries are not stable across re-executions, and the totals
    # branch and the cumsum branch must see the SAME layout.
    with_pid = ranged.withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint()
    counts = with_pid.groupBy("__pid").agg(F.sum("__nt").alias("__n"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    L = F.lit(int(seq_len)).cast("long")
    seg = (
        with_pid.join(F.broadcast(offsets), "__pid")
        .withColumn(
            "__begin",
            F.coalesce(F.sum("__nt").over(w_local), F.lit(0)) + F.col("__off"),
        )
        .withColumn("__end", F.col("__begin") + F.col("__nt"))
        .select(
            id_col, "__begin", "__end",
            F.explode(
                F.sequence(
                    F.floor(F.col("__begin") / L).cast("long"),
                    F.floor((F.col("__end") - 1) / L).cast("long"),
                )
            ).alias("pack_id"),
        )
    )
    seg_begin = F.greatest(F.col("__begin"), F.col("pack_id") * L)
    seg_end = F.least(F.col("__end"), (F.col("pack_id") + 1) * L)
    return seg.select(
        id_col,
        "pack_id",
        (seg_begin - F.col("__begin")).alias("doc_offset"),
        (seg_begin - F.col("pack_id") * L).alias("pack_offset"),
        (seg_end - seg_begin).alias("seg_tokens"),
    )


def pack_segments_staged(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    seq_len: int,
    stage_col: str = "stage",
    order_cols: Sequence[str] = ("batch_id", "pos_in_batch"),
    pack_id_stride: int = 1_000_000_000,
    num_partitions: int | None = None,
) -> DataFrame:
    """:func:`pack_segments` for a PRE-ORDERED, STAGED stream — the
    serving step after
    :func:`~gdp_etl_spark.operators.sampling.curriculum_stages`: lay
    documents end to end in the caller's explicit order
    (``stage_col`` major, then ``order_cols``, id tie-break) and cut
    each stage's token stream into ``seq_len`` windows SEPARATELY, so

    * **no pack spans a stage boundary** — a difficulty ramp consumed
      pack-by-pack never mixes two stages in one training sequence
      (each stage's last pack may be ragged; every other pack is
      exactly full);
    * **the curriculum order survives packing** — within a stage,
      consuming packs by ``pack_id`` and segments by ``pack_offset``
      replays the (batch_id, pos_in_batch) order exactly;
    * ``pack_id`` is stage-major global: ``stage * pack_id_stride +
      pack_in_stage`` (stride guarded, the curriculum_stages rule).

    Output: one row per (document, pack) segment — ``(id, stage,
    pack_id, doc_offset, pack_offset, seg_tokens)``, same segment
    semantics as :func:`pack_segments`.

    Scale shape: the global token cumsum is the same two-pass
    prefix-sum (range partition on the order key, per-partition
    totals, broadcast offsets, local window — no single-partition
    window); the per-stage re-base comes from DRIVER-side stage token
    totals (``n_stages`` rows, an aggregate bounded by parameters,
    which doubles as the stride guard); segment explode is the
    output's intrinsic size.  All arithmetic is integer (``div``, not
    ``floor(double)``), so the layout replays engine-exactly.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    order_cols = list(order_cols)
    clashes = {"pack_id", "doc_offset", "pack_offset", "seg_tokens",
               "__pid", "__off", "__nt", "__begin", "__end",
               "__rel"} & set(df.columns)
    if clashes:
        raise ValueError(
            f"pack_segments_staged output columns collide with input "
            f"columns {sorted(clashes)}; rename or drop them first"
        )
    keys = [stage_col, *order_cols, id_col]
    base = df.filter(F.col(n_tokens_col) > 0).select(
        *keys, F.col(n_tokens_col).cast("long").alias("__nt")
    )
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        base.repartitionByRange(n, *[F.col(c) for c in keys])
        .withColumn("__pid", F.spark_partition_id())
        # one materialization — the assign_row_ids rule: the totals
        # branch and the cumsum branch must see the SAME partitioning
        .localCheckpoint()
    )
    # driver-side stage token totals: n_stages rows — the stage starts
    # for the re-base AND the stride guard in one bounded action
    tots = {
        r[stage_col]: int(r["__t"])
        for r in ranged.groupBy(stage_col).agg(
            F.sum("__nt").alias("__t")
        ).collect()
    }
    if None in tots:
        raise ValueError(
            f"pack_segments_staged: NULL {stage_col} — stage every row "
            f"before packing (curriculum_stages already guarantees it)"
        )
    L = int(seq_len)
    worst = max((-(-t // L) for t in tots.values()), default=0)
    if worst > pack_id_stride:
        raise ValueError(
            f"pack_segments_staged: a stage of {worst} packs exceeds "
            f"the {pack_id_stride} pack-id stride; raise seq_len or "
            f"pack_id_stride"
        )
    start_at, acc = {}, 0
    for s in sorted(tots):
        start_at[s] = acc
        acc += tots[s]
    stage_start = F.coalesce(*[
        F.when(F.col(stage_col) == s, F.lit(v).cast("long"))
        for s, v in start_at.items()
    ]) if start_at else F.lit(0).cast("long")

    counts = ranged.groupBy("__pid").agg(F.sum("__nt").alias("__n"))
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*[F.col(c) for c in keys])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seg = (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn(
            "__rel",
            F.coalesce(F.sum("__nt").over(w_local), F.lit(0))
            + F.col("__off") - stage_start,
        )
        .withColumn("__end", F.col("__rel") + F.col("__nt"))
        .select(
            id_col, stage_col, "__rel", "__end",
            F.explode(
                F.sequence(
                    F.expr(f"__rel div {L}").cast("long"),
                    F.expr(f"(__end - 1) div {L}").cast("long"),
                )
            ).alias("__pk"),
        )
    )
    Lc = F.lit(L).cast("long")
    seg_begin = F.greatest(F.col("__rel"), F.col("__pk") * Lc)
    seg_end = F.least(F.col("__end"), (F.col("__pk") + 1) * Lc)
    return seg.select(
        id_col,
        F.col(stage_col).cast("int").alias(stage_col),
        (
            F.col(stage_col).cast("bigint") * F.lit(int(pack_id_stride))
            + F.col("__pk")
        ).alias("pack_id"),
        (seg_begin - F.col("__rel")).alias("doc_offset"),
        (seg_begin - F.col("__pk") * Lc).alias("pack_offset"),
        (seg_end - seg_begin).alias("seg_tokens"),
    )
