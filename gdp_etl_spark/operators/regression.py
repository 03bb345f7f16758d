"""Grouped ordinary-least-squares trend fit, cross-engine deterministic.

Spark (and DuckDB) ship native ``regr_slope``/``regr_intercept``/
``regr_r2`` aggregates, but their internal double accumulation is
order-dependent — a shuffled sum differs run-to-run in the last ulps,
which breaks value-hash verification and reproducible pipelines.  Nor
does summing ``CAST(x*y AS DECIMAL)`` fix it across engines: engines
round double→decimal differently at large magnitudes (measured: Spark
rounds the exact binary expansion, DuckDB scales in binary64 first).

This operator uses the repo's fixed-point recipe (see
``functions.vectors.dot_fixed``): quantize each coordinate per-row with
``floor(v * 1e6)`` — the scale-multiply and floor are single IEEE-754
ops, bit-identical on any engine — then accumulate the five sufficient
sums (Σx, Σy, Σxy, Σx², Σy²) as *exact* decimal-integer sums, and apply
the closed-form OLS formulas in plain binary64.  Deterministic under
any parallelism, row order, or engine.

One hash aggregation on the group key; no second pass, no UDF.
Quantization bounds: |v|·1e6 must fit a bigint per row (|v| < 9e12) and
cross-products fit decimal(38,0) sums up to ~1e38 rows·magnitude —
far beyond any real series.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: per-coordinate fixed-point scale (6 decimals)
_Q = 1_000_000.0


def _q(col: Column) -> Column:
    """floor(v·1e6) as an exact decimal(19,0) integer."""
    return F.floor(col * F.lit(_Q)).cast("decimal(19,0)")


def _dec2dbl(name: str, scale: float) -> Column:
    """Decimal column (by name) → double via a hi/lo 2^32 split.

    A direct ``CAST(decimal AS DOUBLE)`` above 2^53 is NOT identically
    rounded across engines (DuckDB's two-limb hugeint conversion vs
    Java's correctly-rounded BigDecimal); the split pins every engine to
    the same two-rounding sequence — ``(s − s%2³²)/2³²`` divides
    exactly, both halves convert exactly (sums < 2^85), then one
    multiply-add and the scale division."""
    hi = F.expr(f"CAST(({name} - {name} % 4294967296) / 4294967296 AS DOUBLE)")
    lo = F.expr(f"CAST({name} % 4294967296 AS DOUBLE)")
    return (hi * F.lit(4294967296.0) + lo) / F.lit(scale)


def grouped_linear_fit(
    df: DataFrame,
    group_cols: Sequence[str],
    x: Column | str,
    y: Column | str,
) -> DataFrame:
    """Per-group OLS fit of ``y = slope·x + intercept`` plus ``r2``.

    Rows where either coordinate is NULL are excluded (SQL ``regr_*``
    semantics).  Groups with zero x-variance get NULL slope/intercept/r2;
    r2 is NULL when y has zero variance (0/0).  Coordinates are
    quantized to 6 decimals (the determinism recipe above), so inputs
    should be scaled to "reasonable units" — e.g. hours, not
    microseconds since epoch.
    """
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    both = xc.isNotNull() & yc.isNotNull()
    qx = F.when(both, _q(xc))
    qy = F.when(both, _q(yc))

    agg = df.groupBy(*list(group_cols)).agg(
        F.count(F.when(both, 1)).alias("n"),
        F.sum(qx).alias("isx"),
        F.sum(qy).alias("isy"),
        F.sum(qx * qy).alias("isxy"),
        F.sum(qx * qx).alias("isxx"),
        F.sum(qy * qy).alias("isyy"),
    )
    n = F.col("n").cast("double")
    sx = _dec2dbl("isx", _Q)
    sy = _dec2dbl("isy", _Q)
    sxy = _dec2dbl("isxy", _Q * _Q)
    sxx = _dec2dbl("isxx", _Q * _Q)
    syy = _dec2dbl("isyy", _Q * _Q)
    det_x = n * sxx - sx * sx
    det_y = n * syy - sy * sy
    cov = n * sxy - sx * sy
    slope = F.when(det_x != 0, cov / det_x)
    intercept = F.when(det_x != 0, (sy - (cov / det_x) * sx) / n)
    r2 = F.when((det_x != 0) & (det_y != 0), (cov * cov) / (det_x * det_y))
    return agg.select(
        *list(group_cols),
        F.col("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Welch's unequal-variance two-sample t statistic between two
    named groups — the A/B-comparison primitive, deterministic by the
    same fixed-point recipe as :func:`grouped_linear_fit`.

    One scan, one tiny two-row aggregation; means and (sample)
    variances derive from quantized Σv / Σv², then t and the
    Welch–Satterthwaite degrees of freedom are plain binary64.
    Returns one row: (n_a, n_b, mean_a, mean_b, t_stat, dof).
    NULL t when either group has < 2 rows or both variances are 0.
    """
    g = F.col(group_col)
    v = F.col(value_col)
    qa = F.when(g == F.lit(group_a), _q(v))
    qb = F.when(g == F.lit(group_b), _q(v))
    agg = df.filter(v.isNotNull() & g.isin(group_a, group_b)).agg(
        F.count(F.when(g == F.lit(group_a), 1)).alias("n_a"),
        F.count(F.when(g == F.lit(group_b), 1)).alias("n_b"),
        F.sum(qa).alias("sa"),
        F.sum(qa * qa).alias("saa"),
        F.sum(qb).alias("sb"),
        F.sum(qb * qb).alias("sbb"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    sa = _dec2dbl("sa", _Q)
    sb = _dec2dbl("sb", _Q)
    saa = _dec2dbl("saa", _Q * _Q)
    sbb = _dec2dbl("sbb", _Q * _Q)
    mean_a, mean_b = sa / na, sb / nb
    # sample variance via sums: (Σv² − (Σv)²/n) / (n−1)
    var_a = (saa - sa * sa / na) / (na - F.lit(1.0))
    var_b = (sbb - sb * sb / nb) / (nb - F.lit(1.0))
    se2 = var_a / na + var_b / nb
    t = (mean_a - mean_b) / F.sqrt(se2)
    dof = (se2 * se2) / (
        (var_a / na) * (var_a / na) / (na - F.lit(1.0))
        + (var_b / nb) * (var_b / nb) / (nb - F.lit(1.0))
    )
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0)
    return agg.select(
        "n_a",
        "n_b",
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        F.when(ok, t).alias("t_stat"),
        F.when(ok, dof).alias("dof"),
    )


def rolling_corr(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    x: Column | str,
    y: Column | str,
    preceding: int = 29,
) -> DataFrame:
    """Trailing-window Pearson correlation of two series per group —
    window form of the OLS machinery, deterministic end to end.

    The five sufficient sums accumulate over a value-RANGE frame
    (``preceding`` units of ``order_col`` back to the current row) as
    exact decimal integers of the 1e6-quantized coordinates — double
    window-sums would expose each engine's frame-accumulation order —
    then one closed-form binary64 expression per row.  One shuffle on
    the group key.  ``corr`` is NULL while the frame holds < 2 points
    or either series has zero variance in-frame.
    """
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    # joint NULL mask: a row with either coordinate NULL contributes to
    # NONE of the sufficient statistics (same guard as grouped_linear_fit)
    # — otherwise the frame count includes rows the sums skip and the
    # closed form silently uses an inconsistent n
    both = xc.isNotNull() & yc.isNotNull()
    qx, qy = F.when(both, _q(xc)), F.when(both, _q(yc))
    base = df.select(
        *list(group_cols),
        F.col(order_col),
        qx.alias("__qx"),
        qy.alias("__qy"),
        (qx * qy).alias("__qxy"),
        (qx * qx).alias("__qxx"),
        (qy * qy).alias("__qyy"),
    )
    w = (
        Window.partitionBy(*list(group_cols))
        .orderBy(order_col)
        .rangeBetween(-preceding, 0)
    )
    summed = base.select(
        *list(group_cols),
        F.col(order_col),
        F.count("__qx").over(w).cast("double").alias("__n"),
        F.sum("__qx").over(w).alias("__sqx"),
        F.sum("__qy").over(w).alias("__sqy"),
        F.sum("__qxy").over(w).alias("__sqxy"),
        F.sum("__qxx").over(w).alias("__sqxx"),
        F.sum("__qyy").over(w).alias("__sqyy"),
    )
    n = F.col("__n")
    sx = _dec2dbl("__sqx", _Q)
    sy = _dec2dbl("__sqy", _Q)
    sxy = _dec2dbl("__sqxy", _Q * _Q)
    sxx = _dec2dbl("__sqxx", _Q * _Q)
    syy = _dec2dbl("__sqyy", _Q * _Q)
    det_x = n * sxx - sx * sx
    det_y = n * syy - sy * sy
    corr = F.when(
        (n >= 2) & (det_x > 0) & (det_y > 0),
        (n * sxy - sx * sy) / F.sqrt(det_x * det_y),
    )
    return summed.select(
        *list(group_cols),
        F.col(order_col),
        n.cast("long").alias("n_window"),
        corr.alias("corr"),
    )


def _dec2dbl_wide(name: str, scale: float) -> Column:
    """Decimal column → double, sign-safe and exact-split up to 2⁹⁶:
    the three base-2³² limb MULTIPLES ``a−a%2⁶⁴``, ``a%2⁶⁴−a%2³²`` and
    ``a%2³²`` are each exactly double-representable (≤ 32 significant
    bits at a power-of-two offset), so their casts are rounding-free on
    any engine and the two fixed-order adds are single correctly-
    rounded IEEE ops — deterministic cross-engine where
    :func:`_dec2dbl`'s 2-limb split would overflow its 2⁸⁵ bound
    (whole-table squared sums).  No division: DuckDB's ``//`` performs
    true decimal division, and decimal division scale rules differ
    between engines — the subtraction-of-moduli form avoids the
    operator entirely."""
    B = 4294967296
    B2 = B * B
    a = f"abs({name})"
    return F.expr(
        f"CAST(CASE WHEN {name} < 0 THEN -1.0 ELSE 1.0 END * "
        f"((CAST(({a} - ({a} % {B2})) AS DOUBLE) + "
        f"CAST((({a} % {B2}) - ({a} % {B})) AS DOUBLE)) + "
        f"CAST(({a} % {B}) AS DOUBLE)) AS DOUBLE)"
    ) / F.lit(scale)


def corr_matrix(
    df: DataFrame,
    cols: Sequence[str],
) -> DataFrame:
    """All pairwise Pearson correlations of ``cols`` in ONE aggregation
    — the one-scan answer to "how do my k metrics co-move" that at 100
    TB replaces k·(k−1)/2 separate ``corr()`` jobs (each a full pass)
    with a single map-side-combined pass accumulating the
    O(k²) sufficient sums together.

    Same determinism recipe as the rest of this module: per-row 1e6
    quantization, exact decimal sums, hi/lo-split conversion, one
    closed-form binary64 expression per pair.  Rows with ANY of the k
    columns NULL are excluded entirely (listwise deletion), so every
    pair shares one consistent n.  Output: one row per unordered pair
    ``(col_x, col_y, n, corr)``, NULL corr for degenerate variance.
    """
    cols = list(cols)
    mask = None
    for c in cols:
        nn = F.col(c).isNotNull()
        mask = nn if mask is None else (mask & nn)
    d = df.filter(mask)
    aggs = [F.count(F.lit(1)).cast("double").alias("__n")]
    for i, c in enumerate(cols):
        qc = _q(F.col(c))
        aggs.append(F.sum(qc).alias(f"__s{i}"))
        aggs.append(F.sum(qc * qc).alias(f"__s{i}_{i}"))
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            aggs.append(
                F.sum(_q(F.col(cols[i])) * _q(F.col(cols[j]))).alias(f"__s{i}_{j}")
            )
    summed = d.agg(*aggs)

    # wide (3-limb) conversion: whole-table squared sums exceed
    # _dec2dbl's 2^85 exactness bound long before 100 TB.  The
    # conversions live in their OWN projection, not inlined into the
    # pair structs: each converted sum feeds several pairs, so inlining
    # replicates the limb splits ~k times and the generated
    # doConsume method for the explode blows the JVM's 64 KB limit at
    # k=4 (codegen falls back to interpreted — correct but slow and
    # noisy).  Multi-referenced non-cheap aliases also stop Catalyst's
    # CollapseProject from undoing the split.
    conv = [F.col("__n")]
    for i in range(len(cols)):
        conv.append(_dec2dbl_wide(f"__s{i}", _Q).alias(f"__sd{i}"))
        conv.append(
            _dec2dbl_wide(f"__s{i}_{i}", _Q * _Q).alias(f"__sd{i}_{i}")
        )
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            conv.append(
                _dec2dbl_wide(f"__s{i}_{j}", _Q * _Q).alias(f"__sd{i}_{j}")
            )
    converted = summed.select(*conv)

    pair_rows = []
    n = F.col("__n")
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            sx = F.col(f"__sd{i}")
            sy = F.col(f"__sd{j}")
            sxx = F.col(f"__sd{i}_{i}")
            syy = F.col(f"__sd{j}_{j}")
            sxy = F.col(f"__sd{i}_{j}")
            det_x = n * sxx - sx * sx
            det_y = n * syy - sy * sy
            corr = F.when(
                (n >= 2) & (det_x > 0) & (det_y > 0),
                (n * sxy - sx * sy) / F.sqrt(det_x * det_y),
            )
            pair_rows.append(
                F.struct(
                    F.lit(cols[i]).alias("col_x"),
                    F.lit(cols[j]).alias("col_y"),
                    n.cast("long").alias("n"),
                    corr.alias("corr"),
                )
            )
    return converted.select(
        F.explode(F.array(*pair_rows)).alias("p")
    ).select("p.*")
