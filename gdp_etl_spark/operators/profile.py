"""Table profiling: per-column null counts and cardinality in ONE pass.

The observability primitive every pipeline run wants (schema drift,
null explosions, key-cardinality checks) expressed Spark-first: a
single wide aggregation row — count / null-count / distinct-count per
column, all computed in one scan — unpivoted to a (column, metric)
long table.  Distinct counts use exact ``count_distinct`` so the
result is oracle-checkable; swap ``approx_count_distinct`` at the
call site when 2% error is acceptable and the expand-for-distinct
shuffle is not.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, null_frac, n_distinct) per column.

    ``n_distinct`` counts non-NULL distincts (SQL ``COUNT(DISTINCT c)``
    semantics in both engines)."""
    cols = list(cols or df.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            (F.col(f"__nulls_{c}").cast("double") / F.col("__n"))
            .alias("null_frac"),
            F.col(f"__nd_{c}").alias("n_distinct"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


def equiwidth_histogram(
    df: DataFrame, col: str, nbins: int = 20
) -> DataFrame:
    """Equi-width histogram of a numeric column: (bin, lo, hi, n).

    Two-pass but one-scan-each: a global min/max agg (tiny, broadcast
    back as a literal-free cross join), then one hash agg on the bin
    id.  Bin math is plain binary64 arithmetic — ``floor((x-min)/w)``
    clamped to the last bin — so any IEEE-754 engine reproduces it
    bit-for-bit (oracle-checkable).  Empty bins are emitted with n=0
    via a distributed ``sequence`` explode, not a driver loop.
    NULLs are excluded.
    """
    x = F.col(col)
    bounds = df.agg(
        F.min(x).cast("double").alias("__lo"), F.max(x).cast("double").alias("__hi")
    )
    counted = (
        df.filter(x.isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            # degenerate hi==lo (all values equal) → bin 0, explicitly:
            # the NaN the division would produce routes through floor
            # differently per engine
            F.when(F.col("__hi") == F.col("__lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(nbins - 1),
                    F.floor(
                        (x.cast("double") - F.col("__lo"))
                        / ((F.col("__hi") - F.col("__lo")) / F.lit(float(nbins)))
                    ),
                )
            )
            .cast("int")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid = bounds.select(
        F.explode(F.sequence(F.lit(0), F.lit(nbins - 1))).alias("bin"),
        "__lo",
        "__hi",
    )
    w = (F.col("__hi") - F.col("__lo")) / F.lit(float(nbins))
    return (
        grid.join(counted, "bin", "left")
        .select(
            "bin",
            (F.col("__lo") + F.col("bin") * w).alias("lo"),
            (F.col("__lo") + (F.col("bin") + 1) * w).alias("hi"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
        .orderBy("bin")
    )


def drift_psi(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    nbins: int = 10,
    smoothing: float = 0.5,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    slice of the same metric — the standard distribution-drift monitor
    for feature/score pipelines.

    Bins are equi-width over the REFERENCE min/max (the convention:
    the baseline defines the grid; current values outside it clamp into
    the edge bins).  Per bin: smoothed shares
    ``p = (n_ref + s) / (N_ref + s·nbins)`` (Laplace, so empty bins
    never hit ln(0)), and the contribution ``(q − p)·ln(q / p)``.
    Total PSI = ``sum(psi_contrib)``; rule-of-thumb alert at > 0.2.

    Three scans total (ref bounds, ref counts, cur counts), each a
    map-side partial agg; the per-bin frame is nbins rows.  All math
    after the counts is scalar binary64 — engine-portable.
    """
    x = F.col(col)
    bounds = ref.agg(
        F.min(x).cast("double").alias("__lo"), F.max(x).cast("double").alias("__hi")
    )

    def bin_counts(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.filter(x.isNotNull())
            .crossJoin(F.broadcast(bounds))
            .select(
                F.when(F.col("__hi") == F.col("__lo"), F.lit(0))
                .otherwise(
                    F.greatest(
                        F.lit(0),
                        F.least(
                            F.lit(nbins - 1),
                            F.floor(
                                (x.cast("double") - F.col("__lo"))
                                / (
                                    (F.col("__hi") - F.col("__lo"))
                                    / F.lit(float(nbins))
                                )
                            ),
                        ),
                    )
                )
                .cast("int")
                .alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    grid = bounds.select(
        F.explode(F.sequence(F.lit(0), F.lit(nbins - 1))).alias("bin")
    )
    joined = (
        grid.join(bin_counts(ref, "n_ref"), "bin", "left")
        .join(bin_counts(cur, "n_cur"), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = joined.agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
    )
    s = float(smoothing)
    p = (F.col("n_ref") + F.lit(s)) / (F.col("__tr") + F.lit(s * nbins))
    q = (F.col("n_cur") + F.lit(s)) / (F.col("__tc") + F.lit(s * nbins))
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_ref",
            "n_cur",
            p.alias("p_ref"),
            q.alias("p_cur"),
            ((q - p) * F.log(q / p)).alias("psi_contrib"),
        )
        .orderBy("bin")
    )


def category_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
) -> DataFrame:
    """Chi-square contingency drift between two slices of a categorical
    column — the discrete sibling of :func:`drift_psi`.

    Per category: observed counts in each slice, the expected counts
    under the no-drift hypothesis (marginal products), and the
    category's chi-square contribution; ``sum(chi2_contrib)`` is the
    statistic with ``n_categories − 1`` degrees of freedom.  Categories
    absent from one slice count as zero (full-outer union of the two
    count sets).  One count-agg per slice, a tiny per-category frame,
    all post-count math in plain binary64 — engine-portable.
    """
    c = F.col(col)

    def counts(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.filter(c.isNotNull())
            .groupBy(c.alias("category"))
            .agg(F.count(F.lit(1)).alias(alias))
        )

    joined = (
        counts(ref, "n_ref")
        .join(counts(cur, "n_cur"), "category", "full_outer")
        .select(
            "category",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = joined.agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
    )
    with_tot = joined.crossJoin(F.broadcast(tot))
    n_cat = F.col("n_ref") + F.col("n_cur")
    grand = F.col("__tr") + F.col("__tc")
    e_ref = (F.col("__tr") * n_cat).cast("double") / grand
    e_cur = (F.col("__tc") * n_cat).cast("double") / grand
    contrib = (
        (F.col("n_ref") - e_ref) * (F.col("n_ref") - e_ref) / e_ref
        + (F.col("n_cur") - e_cur) * (F.col("n_cur") - e_cur) / e_cur
    )
    return with_tot.select(
        "category",
        "n_ref",
        "n_cur",
        e_ref.alias("e_ref"),
        e_cur.alias("e_cur"),
        contrib.alias("chi2_contrib"),
    ).orderBy("category")


def equidepth_histogram(
    df: DataFrame, col: str, nbins: int = 10
) -> DataFrame:
    """Equi-depth (quantile) histogram: bins hold ~equal row counts.

    Boundaries are the exact interpolated i/nbins quantiles from ONE
    percentile aggregation — no global sort, no single-partition ntile
    (the naive formulation): the second scan bucketizes each row by
    counting boundaries strictly below it (interior boundaries only),
    one hash agg on the bin id.  Duplicate boundary values (heavy
    hitters spanning quantiles) produce under-filled bins rather than
    splitting equal values across bins — ties stay together.
    NULLs are excluded.  (bin, lo, hi, n); lo/hi are the quantile
    boundaries, bin 0 starts at min, the last bin ends at max.
    """
    x = F.col(col)
    fracs = [i / nbins for i in range(nbins + 1)]
    bounds = df.agg(
        F.percentile(x, F.array(*[F.lit(f) for f in fracs])).alias("__b")
    )
    # interior boundaries __b[1..nbins-1]; bin = count of boundaries < x
    interior = F.slice(F.col("__b"), 2, nbins - 1)
    counted = (
        df.filter(x.isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            F.aggregate(
                interior,
                F.lit(0),
                lambda acc, b: acc
                + F.when(x.cast("double") > b, 1).otherwise(0),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid = bounds.select(
        F.explode(F.sequence(F.lit(0), F.lit(nbins - 1))).alias("bin"), "__b"
    )
    return (
        grid.join(counted, "bin", "left")
        .select(
            "bin",
            F.element_at("__b", F.col("bin") + 1).alias("lo"),
            F.element_at("__b", F.col("bin") + 2).alias("hi"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
        .orderBy("bin")
    )


def table_checksum(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Orderless content checksum of a table — the replication /
    migration validation primitive: compute on both sides of a copy and
    compare one row, no matter how the rows are partitioned or ordered.

    Per row: md5 over a canonical string encoding of the selected
    columns (NULL marked distinctly from the string 'NULL'); the first
    15 hex chars parse into a 60-bit int, and the CHECKSUM is their
    exact decimal sum plus the row count.  Addition is commutative, so
    any partitioning gives the same result, and md5 + base-16 parsing
    are engine-portable (the DuckDB oracle reproduces it exactly).
    A single map-side-combined aggregation — one scan, one tiny row.
    """
    cols = list(cols or df.columns)
    canon = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
            for c in cols
        ],
    )
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("decimal(38,0)")
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h).cast("string").alias("checksum"),
    )


def benford_digits(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic screen for fabricated or truncated numeric feeds (amounts,
    populations, trade volumes follow log-uniform leading digits;
    invented numbers don't).

    The digit is extracted on the exact integer path: 2-decimal money
    doubles recover their integer cents via ``round(x*100)`` (exact —
    the double is within 1e-9 of the integer), and the leading digit is
    the first character of the cents' decimal string — no log10 on
    doubles, so the bucketing is bit-deterministic on any engine.
    Output: one row per digit 1-9 with observed count, observed share,
    Benford expectation ``log10(1+1/d)``, and the χ² contribution —
    one map-side-combined scan, 9-row result.
    """
    # Benford evaluates the first significant digit of |value| — a
    # refunds/credits feed (all-negative amounts) must profile like its
    # positive mirror, not come back empty
    cents = F.abs(F.round(F.col(value_col) * 100).cast("long"))
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    # admit by |CENTS| >= 1, not value > 0: a value in (-0.005, 0.005)
    # rounds to 0 cents, whose "leading digit" 0 would crash the
    # 1-indexed expectation lookup — no significant digit at cent
    # resolution
    counted = (
        df.filter(cents >= 1)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counted.agg(F.sum("n").cast("long").alias("n_total"))
    import math

    expected = F.element_at(
        F.array(*[F.lit(math.log10(1 + 1 / d)) for d in range(1, 10)]),
        F.col("digit"),
    )
    return (
        counted.join(F.broadcast(total))
        .select(
            "digit",
            "n",
            (F.col("n").cast("double") / F.col("n_total")).alias("share"),
            expected.alias("benford_p"),
            (
                (F.col("n") - F.col("n_total") * expected)
                * (F.col("n") - F.col("n_total") * expected)
                / (F.col("n_total") * expected)
            ).alias("chi2_contrib"),
        )
    )


def column_entropy(df: DataFrame, cols) -> DataFrame:
    """Shannon entropy (nats) + distinct count per categorical column —
    the balance/skew profile a feature audit wants next to null counts
    and NDV: entropy 0 = constant column, ln(k) = perfectly uniform
    over k values.

    ONE scan for all k columns: each row stacks into k (column, value)
    pairs (a JVM explode — column-count fan-out, not data-dependent),
    one map-side-combined count per (column, value), then a tiny
    per-column rollup.  k separate histogram scans would read the
    table k times at 100 TB.  NULLs count as a category of their own
    (profiling cares that they exist).  The per-category contribution
    ``−p·ln p`` is a fixed-order IEEE expression over exact integer
    counts, and the cross-category sum runs in floor(·1e9) fixed point
    — deterministic across engines, partitionings, and runs (ln
    determinism per the drift_psi precedent).
    """
    cols = list(cols)
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("__v"),
                    )
                    for c in cols
                ]
            )
        ).alias("cv")
    ).select("cv.column", "cv.__v")
    counted = stacked.groupBy("column", "__v").agg(
        F.count(F.lit(1)).alias("__n")
    )
    tot = counted.groupBy("column").agg(F.sum("__n").cast("long").alias("__t"))
    contrib_q = F.floor(
        -(
            (F.col("__n").cast("double") / F.col("__t").cast("double"))
            * F.log(F.col("__n").cast("double") / F.col("__t").cast("double"))
        )
        * F.lit(1000000000.0)
    ).cast("long")
    return (
        counted.join(F.broadcast(tot), "column")
        .groupBy("column")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            (F.sum(contrib_q).cast("double") / F.lit(1e9)).alias("entropy"),
        )
    )


def vocab_top_coverage(
    df: DataFrame, text_col: str, k: int = 1000
) -> DataFrame:
    """Token-vocabulary construction with coverage statistics — the
    corpus stage behind every tokenizer/vocab decision: the ``k`` most
    frequent whitespace tokens (lowered), each with its corpus count,
    rank, share of all token occurrences, and the cumulative share
    ("a 1k-entry vocab covers X% of the corpus").

    Returns ``(token, cnt, rank, share, cum_share)``, ``k`` rows,
    ordered by (cnt desc, token) so ranks are deterministic under ties.

    Scale shape: one explode + ONE groupBy shuffle on the token, then a
    TakeOrderedAndProject top-k; the grand total is a driver scalar
    from a 1-row aggregate (the documented base-broadcast pattern,
    dimension-free), and the rank/cum-sum window runs over the k
    already-selected rows only — single-partition by construction and
    bounded by ``k``, never by the vocabulary.
    """
    from pyspark.sql import Window

    from ..functions.text import ws_tokens

    counts = (
        df.select(
            F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    # The explode+groupBy feeds BOTH the grand-total scalar and the
    # top-k; persist so it runs once (without it the full token
    # aggregation executes twice — once per action).
    counts = counts.persist()
    try:
        total = counts.agg(F.sum("cnt")).first()[0] or 0
    except Exception:
        counts.unpersist()
        raise
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(k)
        # localCheckpoint materializes the k rows eagerly so the cached
        # token counts can be released before returning — the caller
        # gets a bounded (≤k-row) frame with no dangling persist.
        .localCheckpoint(eager=True)
    )
    counts.unpersist()
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    denom = F.lit(float(total)) if total else F.lit(1.0)
    return (
        top.withColumn("rank", F.row_number().over(w))
        .withColumn("share", F.col("cnt").cast("double") / denom)
        .withColumn(
            "cum_share", F.sum("cnt").over(cum).cast("double") / denom
        )
    )


def per_group_quantile_filter(
    df: DataFrame,
    group_col: str,
    value_col: str,
    q: float,
    keep: str = "above",
) -> DataFrame:
    """Per-group quantile gate — the RefinedWeb/CCNet per-DOMAIN quality
    filter: compute the exact interpolated ``q``-quantile of
    ``value_col`` within each group and keep only the rows on the
    ``keep`` side of their OWN group's threshold (ties at the threshold
    are kept).  A global cutoff silently deletes whole domains whose
    quality distribution sits low (forums vs encyclopedias); the
    per-group gate trims each domain's tail instead — the documented
    reason the published web-corpus pipelines filter per source.

    Returns the surviving rows plus their group's ``threshold``.

    Scale shape: ONE groupBy over the group key (bounded output — one
    row per domain) followed by a BROADCAST join back; the percentile
    is Spark's exact interpolated aggregate.  For group cardinalities
    too large to broadcast, swap the threshold join to a plain
    shuffle join (same semantics); for value streams too hot for an
    exact percentile state, :func:`group_quantile_sketch` is the
    approximate sibling.  Quantiles at non-integer rank positions
    interpolate — engine parity at such positions is within one ulp;
    the oracle-checked configuration pins integer positions.
    """
    if keep not in ("above", "below"):
        raise ValueError(f"keep must be 'above' or 'below', got {keep!r}")
    thr = df.groupBy(group_col).agg(
        F.percentile(F.col(value_col), F.lit(q)).alias("threshold")
    )
    out = df.join(F.broadcast(thr), group_col)
    cond = (
        F.col(value_col) >= F.col("threshold")
        if keep == "above"
        else F.col(value_col) <= F.col("threshold")
    )
    return out.filter(cond)
