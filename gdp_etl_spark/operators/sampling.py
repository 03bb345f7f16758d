"""Deterministic sampling for training-data pipelines.

Random sampling (``df.sample``) is engine- and partitioning-dependent —
useless for reproducible corpus curation.  ``hash_sample`` keys the
decision on a content hash instead: the same row is always in or out,
across runs, engines, partitionings and cluster sizes, and the sample
composes (a 10% sample is a subset of the 20% sample for the same
seed).  Per-stratum rates via ``stratified_hash_sample`` give quota
control (e.g. language balancing) with the same determinism.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: md5-prefix bucket space: first 8 hex chars → uniform 32-bit int
_BUCKETS = 1 << 32


def _hash_bucket(key: Column, seed: str) -> Column:
    """Uniform [0, 2^32) bucket from md5 of (key, seed) — portable to
    any engine with md5 (DuckDB mirror:
    ``CAST('0x' || substr(md5(key || ':' || seed), 1, 8) AS BIGINT)``)."""
    h = F.md5(F.concat_ws(":", key.cast("string"), F.lit(seed)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: str = "42"
) -> DataFrame:
    """Keep rows whose hash bucket falls below ``fraction`` of the
    bucket space — deterministic, composable sampling."""
    threshold = int(fraction * _BUCKETS)
    return df.filter(_hash_bucket(F.col(key_col), seed) < F.lit(threshold))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    seed: str = "42",
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. language balancing:
    ``{"en": 0.1, "de": 1.0}``); strata not listed get
    ``default_fraction``."""
    threshold: Column | None = None
    for stratum, frac in fractions.items():
        cond = F.col(stratum_col) == stratum
        lim = F.lit(int(frac * _BUCKETS))
        threshold = (
            F.when(cond, lim)
            if threshold is None
            else threshold.when(cond, lim)
        )
    default = F.lit(int(default_fraction * _BUCKETS))
    threshold = default if threshold is None else threshold.otherwise(default)
    return df.filter(_hash_bucket(F.col(key_col), seed) < threshold)


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: Mapping[str, float] | None = None,
    seed: str = "42",
) -> DataFrame:
    """Deterministic dataset split: each row gets a split label from its
    hash bucket against cumulative fraction thresholds (insertion order
    of ``fractions``).  Same guarantees as :func:`hash_sample` — stable
    across runs, engines and partitionings, and leak-free: a key can
    never land in two splits.  Fractions must sum to 1."""
    if fractions is None:
        fractions = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if "split" in df.columns:
        raise ValueError(
            "output column 'split' already exists — re-splitting a "
            "labelled frame would silently overwrite its labels; drop "
            "or rename the column first"
        )
    bucket = _hash_bucket(F.col(key_col), seed)
    acc = 0.0
    expr = None
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = bucket < F.lit(int(acc * _BUCKETS))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    expr = (
        F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn("split", expr)


def mix_to_budget(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    tokens_col: str,
    budget: int,
    weights: Mapping[str, int],
    seed: str = "mix",
) -> DataFrame:
    """Domain-weighted corpus mixing to a total token budget.

    The standard last step of a training-data pipeline: given a target
    ``budget`` of tokens and integer mixing ``weights`` per domain
    (language, source, quality tier…), each domain ``d`` gets a token
    target ``budget * w_d / sum(w)`` and a deterministic hash-sampling
    rate ``min(1, target_d / available_d)``.  Domains absent from
    ``weights`` get weight 0 (dropped).

    Determinism & portability: the rate is quantized to parts-per-million
    with pure BIGINT floor arithmetic —
    ``rate_ppm = min(1e6, budget*w*1e6 // (W*available))`` — and a row is
    kept iff ``md5-bucket(key, seed) % 1e6 < rate_ppm``.  Every quantity
    is integer, so any engine with md5 reproduces the exact sample (the
    DuckDB oracle replays it bit-for-bit).

    Overflow guard: with ANSI off, ``budget * w * 1_000_000`` past int64
    would WRAP silently (negative rate → the whole domain dropped), so
    the numerator bound is checked driver-side from ``budget`` and
    ``max(w)`` and raises ``ValueError`` before any job runs.  A
    multi-trillion-token budget should divide the weights' common factor
    out (rates only depend on ``w/W``) or pre-scale ``budget`` and
    ``tokens_col`` to kilotokens — both keep the recipe inside int64.

    Scale shape: one tiny per-domain aggregate (|domains| rows) joined
    back — AQE broadcasts it, the corpus never shuffles; the keep
    decision is per-row map work.  Returns the sampled rows plus
    ``rate_ppm``.
    """
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to a positive integer")
    max_num = int(budget) * max(weights.values()) * 1_000_000
    if max_num > (1 << 63) - 1:
        raise ValueError(
            f"budget*max(weight)*1e6 = {max_num} exceeds int64; the "
            f"ppm rate arithmetic would wrap silently (ANSI off) and "
            f"drop domains.  Divide the weights by their gcd or express "
            f"budget/tokens_col in kilotokens."
        )
    clash = {"rate_ppm", "__w", "__avail", "__gavail"} & set(df.columns)
    if clash:
        raise ValueError(f"output/work columns already exist: {sorted(clash)}")
    wmap = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    avail = df.groupBy(domain_col).agg(
        F.sum(F.col(tokens_col).cast("bigint")).alias("__avail")
    )
    w = F.coalesce(wmap[F.col(domain_col)], F.lit(0)).cast("bigint")
    # the numerator guard above is driver-side; the DENOMINATOR
    # total_w*avail depends on data, so it gets a data-side guard — a
    # wrap with ANSI off would yield a non-positive rate and silently
    # drop the whole domain (self-review finding)
    den_limit = ((1 << 63) - 1) // int(total_w)
    guarded_avail = F.when(
        F.col("__avail") > F.lit(den_limit),
        F.raise_error(
            F.concat(
                F.lit(
                    f"mix_to_budget: domain token total exceeds "
                    f"int64/total_w (= {den_limit}) — the rate "
                    f"denominator would wrap; express tokens_col in "
                    f"kilotokens or reduce the weights: "
                ),
                F.col(domain_col).cast("string"),
            )
        ).cast("bigint"),
    ).otherwise(F.col("__avail"))
    # BIGINT floor division (`div`), never `/` (double division in Spark)
    rate = F.least(
        F.lit(1_000_000).cast("bigint"),
        F.expr(
            f"(CAST({int(budget)} AS BIGINT) * __w * 1000000) "
            f"div (CAST({int(total_w)} AS BIGINT) * __gavail)"
        ),
    )
    keep = _hash_bucket(F.col(key_col), seed) % F.lit(1_000_000)
    return (
        df.join(avail, domain_col)
        .withColumn("__w", w)
        .withColumn("__gavail", guarded_avail)
        .withColumn("rate_ppm", rate)
        .filter(keep < F.col("rate_ppm"))
        .drop("__avail", "__w", "__gavail")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: str = "ws",
) -> DataFrame:
    """Efraimidis–Spirakis weighted sampling without replacement:
    every row draws a deterministic uniform u ∈ (0, 1] from its content
    hash and scores ``ln(u) / w``; the top-``k`` scores win.  Selection
    probability is proportional to weight, yet the draw is fully
    reproducible (same rows across runs, engines, partitionings) —
    ``df.sample``'s weighted cousin for corpus curation quotas.

    Scale shape: score is per-row map work; top-k plans as
    TakeOrderedAndProject (per-partition heaps + driver merge of k),
    never a global sort.  Zero/negative/NULL-weight rows are EXCLUDED
    by filter (P(select) ∝ weight means weight 0 is never selected —
    the previous −∞ score let them pad the result when k exceeded the
    positive-weight row count, a self-review finding)."""
    u = (
        (_hash_bucket(F.col(key_col), seed) + F.lit(1)).cast("double")
        / F.lit(float(_BUCKETS))
    )
    w = F.col(weight_col).cast("double")
    return (
        df.filter(w > 0)
        .withColumn("__score", F.log(u) / w)
        .orderBy(F.col("__score").desc(), F.col(key_col))
        .limit(k)
        .drop("__score")
    )


def sample_per_group(
    df: DataFrame,
    group_cols,
    key_col: str,
    k: int,
    seed: str = "pg",
) -> DataFrame:
    """Exactly ``min(k, group size)`` rows per group, deterministically:
    rows rank by their content-hash bucket (the same md5 recipe as
    hash_sample, so draws are stable across runs/engines and
    uncorrelated with the data's natural order), ties broken by key.

    The per-group-quota complement to ``hash_sample`` (global rate) and
    ``weighted_sample`` (global top-k by weight): balanced stratified
    downsampling — "at most k docs per (source, lang)" — where a rate
    sample would keep group skew.  One window shuffle on the group key;
    no global sort, no driver state.
    """
    w = Window.partitionBy(*list(group_cols)).orderBy(
        _hash_bucket(F.col(key_col), seed), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def temperature_mix(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    tokens_col: str,
    budget: int,
    alpha: float = 0.5,
    seed: str = "temp",
) -> DataFrame:
    """Temperature-based domain mixing — the multilingual-pretraining
    sampler (mBERT/XLM-R's ``p_d ∝ f_d^α``): domain shares are derived
    from AVAILABILITY raised to ``alpha`` rather than hand-set weights,
    so abundant domains are down-weighted and scarce ones up-weighted
    smoothly.  ``alpha=1`` reproduces natural proportions, ``alpha=0``
    uniform across domains; 0.3–0.7 is the published range.

    Each domain's token target is ``budget · f_d^α / Σ f^α`` and its
    deterministic keep rate ``min(1, target_d / f_d)``, quantized to
    parts-per-million (``floor``) and compared against the same md5
    bucket as every sampler here — so the sample is reproducible
    across runs, engines and partitionings.  Portability caveat (the
    quantized-``ln`` caveat of the LM scorer, transposed): the one
    non-integer step is ``pow(f_d, α)``; a 1-ulp cross-engine ``pow``
    discrepancy flips a ppm floor only when the product lands within
    ~1e-10 of an integer — negligible per corpus, and confined to ±1
    ppm of sampling rate if it ever fires.

    Returns the sampled rows plus ``rate_ppm``.  Scale shape: one
    |domains|-row aggregate, a 1-row total broadcast onto it, and a
    broadcast join back — the corpus itself never shuffles; the keep
    decision is map-only.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    if "rate_ppm" in df.columns:
        raise ValueError(
            "output column 'rate_ppm' already exists — the rates join "
            "would produce an ambiguous duplicate; drop or rename it"
        )
    avail = df.groupBy(domain_col).agg(
        F.sum(F.col(tokens_col).cast("bigint")).alias("__avail")
    )
    powed = avail.withColumn(
        "__pw", F.pow(F.col("__avail").cast("double"), F.lit(float(alpha)))
    )
    total = powed.agg(F.sum("__pw").alias("__tot"))
    rates = (
        powed.crossJoin(F.broadcast(total))
        .withColumn(
            "rate_ppm",
            F.least(
                F.lit(1_000_000),
                F.floor(
                    F.lit(float(budget))
                    * F.col("__pw")
                    / F.col("__tot")
                    / F.col("__avail").cast("double")
                    * F.lit(1_000_000.0)
                ).cast("long"),
            ),
        )
        .select(domain_col, "rate_ppm")
    )
    bucket = _hash_bucket(F.col(key_col), seed) % F.lit(1_000_000)
    return (
        df.join(F.broadcast(rates), domain_col)
        .filter(bucket < F.col("rate_ppm"))
    )


def cluster_safe_split(
    docs: DataFrame,
    near_dup_pairs: DataFrame,
    id_col: str,
    fractions: Mapping[str, float] | None = None,
    seed: str = "42",
) -> DataFrame:
    """Leak-free dataset split for pipelines that KEEP near-duplicates:
    every member of a near-dup cluster lands in the SAME split, because
    the split key is the cluster's canonical id (minimum reachable
    member), not the document's own id.  Splitting on doc ids leaks —
    two near-identical documents straddling train/test is memorization
    measured as generalization; deduplicating first avoids it only when
    deletion is acceptable, which eval-set curation often forbids.

    ``near_dup_pairs`` is any (id_a, id_b) frame — MinHash-LSH,
    SimHash, embedding-cosine.  Isolated documents (no pair) are their
    own cluster and split by their own id, so the output is a total
    function of the input: every doc gets exactly one split label.
    Returns all ``docs`` columns plus ``cluster_id`` and ``split``.

    Scale shape: components over the PAIR graph (near-dup-pair-sized,
    ≪ corpus; driver union-find fast path under the threshold, bounded
    min-label loop above it), broadcast-joined back to the corpus when
    small; the split itself is the map-only md5-bucket rule of
    :func:`hash_split` applied to the cluster key — deterministic
    across runs, engines, and partitionings.
    """
    from .cluster import connected_components

    comp = connected_components(near_dup_pairs, "id_a", "id_b")
    labeled = docs.join(
        comp.withColumnRenamed("node", id_col),
        id_col,
        "left",
    ).withColumn(
        "cluster_id", F.coalesce(F.col("component"), F.col(id_col))
    ).drop("component")
    out = hash_split(labeled, "cluster_id", fractions, seed)
    return out


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int,
    n_shards: int,
    seed: str = "epoch",
) -> DataFrame:
    """Reproducible per-epoch global shuffle + sharding for training-
    data serving: every epoch reads the corpus in a DIFFERENT but
    fully deterministic order (same rows, same shards, same positions
    across runs, engines, and cluster sizes — ``df.sample``/
    ``orderBy(rand())`` give neither).  Each row gets

    * ``shard`` — ``hash(id : epoch : seed) mod n_shards``: which
      output file serves it this epoch;
    * ``position`` — the row's rank by that hash inside its shard:
      the read order within the file.

    The hash is the portable md5 fold (see ``_hash_bucket``), so the
    assignment replays in any engine.  Epoch e+1 re-hashes with a new
    fold key — an independent permutation, which is what shuffling
    between epochs is for (the same pairwise orderings never repeat).

    Scale shape: the only non-map work is the per-shard rank — ONE
    window whose partitions are hash-uniform by construction, each
    ~N/n_shards rows; callers pick ``n_shards`` to size shard files
    for serving (e.g. ≤1 GiB), which simultaneously bounds the sort
    task.  There is no global sort and no driver state.
    """
    if n_shards < 1:
        # pmod(x, 0) is NULL, so every row would get a NULL shard and
        # NULL-partition position silently (verdict-advice r9)
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    clashes = {"shard", "position", "epoch", "__h"} & set(df.columns)
    if clashes:
        # withColumn would silently OVERWRITE these — and a frame that
        # already carries shard/epoch from a previous pass is exactly
        # this operator's natural input
        raise ValueError(
            f"epoch_shuffle output columns collide with input columns "
            f"{sorted(clashes)}; rename or drop them first"
        )
    fold = f"{epoch}:{seed}"
    h = F.md5(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(fold))
    )
    out = df.withColumn("__h", h).withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring(F.col("__h"), 1, 15), 16, 10).cast("long"),
            F.lit(n_shards),
        ).cast("int"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("__h"), F.col(id_col))
    return (
        out.withColumn("position", F.row_number().over(w))
        .drop("__h")
        .withColumn("epoch", F.lit(epoch).cast("int"))
    )


def stratified_split(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    splits: Mapping[str, int],
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """EXACT-proportion, leak-stable train/val/test assignment per
    stratum — the quota-true sibling of :func:`stratified_hash_sample`
    (which is Bernoulli per row: a 10% val split of a 1,000-doc
    language holds 100 docs only in expectation; evaluation sets need
    the quota, not its expectation).

    ``splits`` maps label → integer weight (e.g. ``{"train": 8,
    "val": 1, "test": 1}``); each stratum is ordered by the portable
    md5 fold of (id, seed) and cut into ``sum(weights)`` ntiles by the
    exact even-split rule, with consecutive ntile runs assigned to
    labels in the caller's dict order.  Proportions are therefore
    exact to ntile granularity WITHIN EVERY stratum, assignment is
    deterministic across runs/engines/partitionings, and the hash
    ordering makes the cut independent of any data column.

    Scale shape: the ntile comes from
    :func:`~gdp_etl_spark.operators.ids.grouped_ntile` (range
    partitions + prefix-sum offsets), so a dominant stratum never pins
    one task the way ``ntile() OVER (PARTITION BY stratum)`` would —
    and unlike row_number-top-k there is NO optimizer pushdown that
    rescues the window form (ntile has no WindowGroupLimit).

    Note the contract difference vs :func:`hash_sample`: re-splitting
    after the corpus grows REASSIGNS rows (quotas are exact for the
    new total), whereas per-row hash gates are append-stable but only
    approximate.  Pick by need; this operator is for frozen evaluation
    snapshots.
    """
    from .ids import grouped_ntile

    if not splits or any(w < 1 for w in splits.values()):
        raise ValueError("splits must map labels to positive weights")
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    n = sum(splits.values())
    bucketed = grouped_ntile(
        df,
        [stratum_col],
        [_hash_bucket(F.col(id_col), seed), F.col(id_col)],
        n_buckets=n,
        bucket_col="__tile",
    )
    expr = None
    lo = 1
    for label, w in splits.items():
        cond = F.col("__tile") < F.lit(lo + w)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(
            cond, F.lit(label)
        )
        lo += w
    return bucketed.withColumn(out_col, expr).drop("__tile")


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
    num_buckets: int = 4096,
    seed: str = "dsir",
    quantize: int = 10**9,
) -> DataFrame:
    """DSIR importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023): score every corpus document by how
    much more likely its hashed word-``n``-gram bag is under the
    TARGET distribution (a bounded sample of the data you want more
    of) than under the RAW corpus distribution —
    ``log w(doc) = Σ_grams [log p_target(bucket) − log p_raw(bucket)]``
    with add-one smoothing over ``num_buckets`` hashed features.  The
    standard cheap alternative to model-based quality filtering:
    select/resample by weight to shift a 100-TB crawl toward a
    curated target (composes with :func:`weighted_sample` for the
    paper's resampling step, or a plain top-k for hard selection).

    Returns ``(id_col, n_grams bigint, dsir_qsum bigint)`` where
    ``dsir_qsum`` is the sum over the document's gram OCCURRENCES
    (multiplicity kept — it is a unigram LM over features) of the
    per-bucket quantized log-ratio.  Blank/tokenless docs score 0/0.

    Determinism (the ``trigram_lm_scores`` recipe): each of the four
    log terms per bucket is ``floor(ln(integer) · quantize)`` — ln of
    exact integer counts, ≤ ``2·num_buckets + 2`` distinct inputs per
    corpus — so per-doc sums are exact integer adds and the whole
    score replays bit-identically across runs, partitionings and
    engines (full-hash oracle).  Buckets unseen in either corpus get
    count 0 → ``ln(1) = 0`` via smoothing.

    Scale shape: two feature-count aggregates bounded by
    ``num_buckets`` ROWS (never by data), fused into one broadcast
    weight table; totals are two bounded collects; scoring is one
    explode → map-side bucket hash → broadcast equi-join → per-doc
    partial aggregate.  The corpus text never shuffles; shuffle keys
    are (id, partial sums) only.
    """
    from ..functions.text import word_ngrams

    if num_buckets < 2:
        raise ValueError(f"num_buckets must be >= 2, got {num_buckets}")

    def bucket(gram: Column) -> Column:
        h = F.md5(F.concat_ws(":", gram, F.lit(seed)))
        return F.pmod(
            F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint"),
            F.lit(int(num_buckets)),
        )

    def gram_buckets(df: DataFrame):
        return df.select(
            F.explode(word_ngrams(F.col(text_col), n)).alias("__g")
        ).select(bucket(F.col("__g")).alias("__b"))

    # the count frames are <= num_buckets rows (output-sized, the
    # cache discipline's requirement) and have TWO consumers each — the
    # totals collect below and the weights join — so they materialize
    # ONCE here; without the barrier the dominant cost (the corpus-wide
    # n-gram explode) executed as two separate jobs (self-review
    # finding)
    t_counts = (
        gram_buckets(target)
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__ct"))
        .localCheckpoint(eager=True)
    )
    r_counts = (
        gram_buckets(docs)
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__cr"))
        .localCheckpoint(eager=True)
    )
    # totals: bounded collects over the <= num_buckets-row count frames
    # (the kmeans-stats rule) — embedding exact integers as literals
    # keeps the scalar out of the plan (no 1-row crossJoin needed)
    n_t = t_counts.agg(F.sum("__ct")).collect()[0][0] or 0
    n_r = r_counts.agg(F.sum("__cr")).collect()[0][0] or 0

    def qln(x: Column) -> Column:
        return F.floor(
            F.log(x.cast("double")) * F.lit(float(quantize))
        ).cast("bigint")

    weights = (
        t_counts.join(r_counts, "__b", "full")
        .select(
            "__b",
            (
                qln(F.coalesce(F.col("__ct"), F.lit(0)) + F.lit(1))
                # the totals are exact collected integers; their qln is
                # a Spark expression (constant-folded) so ALL four log
                # terms share one engine's ln — the same single
                # cross-engine assumption trigram_lm_scores documents
                - qln(F.lit(int(n_t + num_buckets)))
                - qln(F.coalesce(F.col("__cr"), F.lit(0)) + F.lit(1))
                + qln(F.lit(int(n_r + num_buckets)))
            ).alias("__w"),
        )
        # no checkpoint needed here: both inputs are checkpointed tiny
        # frames, and the weights join has a single consumer
    )
    scored = (
        docs.select(
            F.col(id_col),
            F.explode_outer(word_ngrams(F.col(text_col), n)).alias("__g"),
        )
        # explode_outer keeps gramless docs as one NULL-gram row; the
        # bucket must stay NULL for it (concat_ws SKIPS null args, so
        # an unguarded hash would silently bucket the seed string and
        # count a phantom gram)
        .select(
            id_col,
            F.when(
                F.col("__g").isNotNull(), bucket(F.col("__g"))
            ).alias("__b"),
        )
        .join(F.broadcast(weights), "__b", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("__b")).alias("n_grams"),
            F.coalesce(F.sum("__w"), F.lit(0)).cast("bigint").alias(
                "dsir_qsum"
            ),
        )
    )
    return scored


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    tokens_col: str,
    budget: int,
    n: int = 2,
    num_buckets: int = 4096,
    seed: str = "dsir",
    num_partitions: int | None = None,
) -> DataFrame:
    """DSIR selection — the step the paper runs AFTER scoring: rank
    the corpus by importance weight and keep documents in rank order
    until the token ``budget`` is filled (top-k importance selection;
    for the probabilistic resampling variant compose
    :func:`dsir_weights` with :func:`weighted_sample` instead).  The
    boundary document that would overflow the budget is dropped — the
    cut is a pure prefix of the ranked stream, so the selected set is
    unique and engine-replayable (``SUM(tokens) OVER (ORDER BY
    dsir_qsum DESC, id)`` ≤ budget in SQL).

    Returns the selected docs' ``(id_col, n_grams, dsir_qsum,
    tokens_col, cum_tokens)`` — ``cum_tokens`` includes the row itself.

    Scale shape: scoring is :func:`dsir_weights` (corpus text never
    shuffles); ranking+cumsum is the two-pass prefix sum
    (range-repartition by the rank key, per-partition window, ONE
    broadcast offsets row per partition — the pack_segments recipe),
    never a single global window; the final filter is map-side.  Only
    (id, score, tokens) rows enter the sort — text stays behind and is
    re-joined by the caller if needed.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = dsir_weights(
        docs, target, text_col, id_col,
        n=n, num_buckets=num_buckets, seed=seed,
    )
    # NULL token counts must raise (the length_bucketed_batches rule):
    # a NULL is skipped by the window F.sum, so the doc would inherit
    # the previous cum_tokens, pass the budget filter, and be selected
    # WITHOUT consuming budget — silently diverging from the oracle,
    # which coalesces to 0 (advisor finding)
    tok_guard = F.when(
        F.col(tokens_col).isNull(),
        F.raise_error(
            F.concat(
                F.lit("dsir_select: NULL token count for "),
                F.col(id_col).cast("string"),
                F.lit("; clean or coalesce token counts first"),
            )
        ).cast("bigint"),
    ).otherwise(F.col(tokens_col).cast("bigint"))
    slim = docs.select(
        id_col, tok_guard.alias(tokens_col)
    ).join(w, id_col)
    # rank key: score DESC, id ASC — expressed as ascending (-score, id)
    # so repartitionByRange and the window share one plain sort key
    keyed = slim.withColumn("__negq", -F.col("dsir_qsum"))
    npart = (
        num_partitions
        or docs.sparkSession.sparkContext.defaultParallelism
    )
    # materialize the range partitioning ONCE (assign_row_ids rule):
    # RangePartitioner boundaries are not stable across
    # re-materializations, and the totals branch + the cumsum branch
    # must see the SAME partitioning
    ranged = (
        keyed.repartitionByRange(npart, F.col("__negq"), F.col(id_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    totals = ranged.groupBy("__pid").agg(
        F.sum(tokens_col).alias("__t")
    )
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # per-partition totals frame: ≤ npart rows — the one benign
    # unpartitioned window (statistics-scale, same as pack_segments)
    offsets = totals.select(
        "__pid",
        F.coalesce(F.sum("__t").over(w_off), F.lit(0)).alias("__off"),
    )
    w_local = Window.partitionBy("__pid").orderBy("__negq", id_col)
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn(
            "cum_tokens",
            F.sum(tokens_col).over(w_local) + F.col("__off"),
        )
        .filter(F.col("cum_tokens") <= F.lit(int(budget)))
        .select(id_col, "n_grams", "dsir_qsum", tokens_col, "cum_tokens")
    )


def curriculum_stages(
    df: DataFrame,
    score_col: str,
    id_col: str,
    n_stages: int = 4,
    batch_size: int = 32,
    seed: str = "curriculum",
    num_partitions: int | None = None,
    batch_id_stride: int = 1_000_000_000,
) -> DataFrame:
    """Curriculum ordering for training data (Bengio et al. 2009, the
    data-ordering recipe LLM runs use for difficulty ramps): rank every
    doc easy→hard by ``score_col`` (ties broken by ``id_col``), cut the
    ranking into ``n_stages`` equal-count stages, then DETERMINISTICALLY
    shuffle within each stage (md5 of id+seed — stage order is the
    curriculum, intra-stage order must not re-sort by difficulty or the
    gradient sees a monotone drift) and emit fixed-size batches.

    Returns ``(id_col, score_col, stage int, batch_id bigint,
    pos_in_batch int)``: ``batch_id`` is globally unique and ordered —
    all of stage s's batches precede stage s+1's — so a trainer
    consuming batches in ``batch_id`` order walks the curriculum.

    Scale shape: the global easy→hard ranking uses the two-pass
    prefix-sum row-id recipe (``ids.assign_row_ids`` — range partition
    + per-partition offsets, NO single-partition window); the
    intra-stage shuffle ranking reuses the same machinery on the md5
    key.  Everything downstream is integer arithmetic on the two
    ordinals, so the full batch layout is engine-replayable.  NULL
    scores are rejected loudly (the length_bucketed_batches rule) —
    an unscored doc has no place in a difficulty ramp.
    """
    from .ids import assign_row_ids

    if n_stages < 1:
        raise ValueError(f"n_stages must be >= 1, got {n_stages}")
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    guard = F.when(
        F.col(score_col).isNull(),
        F.raise_error(
            F.concat(
                F.lit("curriculum_stages: NULL score for "),
                F.col(id_col).cast("string"),
                F.lit("; score every doc before ordering"),
            )
        ).cast("double"),
    ).otherwise(F.col(score_col).cast("double"))
    scored = df.select(id_col, guard.alias(score_col))
    ranked = assign_row_ids(
        scored, [score_col, id_col], id_col="__rank",
        num_partitions=num_partitions,
    )
    n = ranked.count()  # bounded action on the checkpointed frame
    if n == 0:
        return ranked.select(
            id_col, score_col,
            F.lit(0).cast("int").alias("stage"),
            F.lit(0).cast("bigint").alias("batch_id"),
            F.lit(0).cast("int").alias("pos_in_batch"),
        ).limit(0)
    # stage s gets ranks [s*n/K, (s+1)*n/K) — integer, exact, balanced
    stage = F.expr(f"cast(__rank * {int(n_stages)} div {int(n)} as int)")
    staged = ranked.withColumn("stage", stage).withColumn(
        "__shuf",
        F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(seed))),
    )
    laid = assign_row_ids(
        staged, ["stage", "__shuf", id_col], id_col="__pos",
        num_partitions=num_partitions,
    )
    # __pos is globally dense in (stage, shuffle) order; batches must
    # be STAGE-PURE (a ragged last batch per stage, never one spanning
    # a difficulty boundary), so positions re-base on the stage's own
    # offset.  The min-per-stage window is keyed on stage — n_stages
    # partitions of the already-checkpointed frame, bounded work.
    laid = laid.withColumn(
        "__soff", F.min("__pos").over(Window.partitionBy("stage"))
    )
    # stage-major global batch id needs every stage's batch count under
    # the stride; n is known, stage sizes are balanced within 1, so the
    # bound is exact and checked up front instead of colliding silently
    stride = int(batch_id_stride)
    max_stage_rows = -(-n // n_stages)  # ceil
    if -(-max_stage_rows // batch_size) > stride:
        raise ValueError(
            f"curriculum_stages: a stage of {max_stage_rows} rows at "
            f"batch_size={batch_size} exceeds the {stride} batch-id "
            f"stride; raise batch_size or n_stages"
        )
    rel = F.col("__pos") - F.col("__soff")
    # integer div, not floor(double/double): exact at any row count
    # (double division loses exactness past 2^53 — review finding)
    batch_in_stage = F.expr(
        f"(__pos - __soff) div {int(batch_size)}"
    ).cast("bigint")
    return laid.select(
        id_col,
        score_col,
        "stage",
        # stage-major global batch id: all of stage s's batches precede
        # stage s+1's (stride guarded above)
        (
            F.col("stage").cast("bigint") * F.lit(stride)
            + batch_in_stage
        ).alias("batch_id"),
        (rel % F.lit(int(batch_size))).cast("int").alias("pos_in_batch"),
    )
