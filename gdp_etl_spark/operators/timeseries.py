"""Time-series regularization and slowly-changing-dimension history.

Two batch operators a warehouse team reaches for constantly and the
reference (a yearly-frequency GDP pipeline) never needed:

* :func:`resample_locf` — regularize an irregular event series onto a
  fixed-step time grid, carrying the last observation forward (LOCF).
  The sibling of :mod:`.interpolate` (linear fill over integer grids):
  same densify-then-window shape, but over timestamps and with
  step-function semantics.
* :func:`scd2_intervals` — compress a keyed change log into SCD-type-2
  validity intervals ``[valid_from, valid_to)`` with one row per
  *distinct consecutive* attribute value (gaps-and-islands collapse +
  ``lead`` for the closing bound).

Both are pure window/join compositions — zero UDFs, and every step
hashes on the same group key, so Catalyst reuses one exchange.

Scale notes (100 TB): the dense grid is ``groups × (span / step)`` rows
generated *distributed* (explode of ``sequence`` after a group-by —
never a driver loop).  Pick ``step`` so the per-group sequence stays
bounded (e.g. hourly over a month = 720 elements); the explode then
fans out map-side with no extra shuffle.  SCD2 shuffles once on the
entity key for the windows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: fixed-length time units in microseconds (UTC session zone, no DST —
#: pinned in session.get_spark).  Calendar units (month, year) are
#: variable-length and handled by date_trunc with n=1 only.
_UNIT_MICROS = {
    "second": 1_000_000,
    "minute": 60 * 1_000_000,
    "hour": 3_600 * 1_000_000,
    "day": 86_400 * 1_000_000,
    "week": 7 * 86_400 * 1_000_000,
}


def resample_locf(
    df: DataFrame,
    group_cols: Sequence[str],
    time_col: str,
    value_col: str,
    step: str = "1 hour",
    out_col: str | None = None,
) -> DataFrame:
    """Resample each group's series onto a fixed-step grid with LOCF.

    Grid points are ``date_trunc``-aligned for single-unit steps and
    epoch-aligned (``floor(us / step) * step``, the :func:`F.window`
    convention) for multi-unit fixed-length steps; they span each
    group's observed range.  At each grid point the output is the value
    of the latest observation at-or-before it (step-function semantics);
    grid points before a group's first observation stay NULL.  Multiple
    observations inside one bucket resolve to the *latest* by ``time_col``
    (deterministic, matches as-of semantics).

    ``step`` must be a Spark interval literal whose unit is also a valid
    ``date_trunc`` field (``"1 hour"``, ``"1 day"``, ``"15 minutes"`` is
    aligned to the minute).  Returns one row per (group, bucket) with
    ``out_col`` (default ``value_col``) filled and ``was_observed``
    marking buckets that contained a real observation.
    """
    out_col = out_col or value_col
    group_cols = list(group_cols)
    parts = step.strip().split()
    n_units = int(parts[0]) if len(parts) == 2 else 1
    unit = parts[-1].rstrip("s")  # "15 minutes" -> "minute"
    if unit not in _UNIT_MICROS and n_units != 1:
        # calendar units have no fixed micro length; a "3 month" grid
        # would need add_months bucketing — unsupported rather than wrong
        raise ValueError(
            f"multi-unit step {step!r} is only supported for fixed-length "
            f"units {sorted(_UNIT_MICROS)}; use a single calendar unit "
            f"(e.g. '1 month') or a fixed-length step"
        )

    # Bucketing convention: single-unit steps truncate with date_trunc
    # (so calendar units like month/year work, and '1 week' keeps the
    # Monday alignment users expect); multi-unit fixed-length steps
    # floor onto the EPOCH-ALIGNED grid floor(us/step)*step — the same
    # convention as Spark's own F.window().  Epoch alignment makes the
    # bucket a pure per-row expression (no per-group anchor), so the
    # observation side needs no join and the whole operator stays a
    # single union + single window exchange on the group key.
    if n_units == 1:
        def bucket_of(c: Column) -> Column:
            return F.date_trunc(unit, c)
    else:
        step_us = n_units * _UNIT_MICROS[unit]

        def bucket_of(c: Column) -> Column:
            return F.timestamp_micros(
                F.floor(F.unix_micros(c) / F.lit(step_us)).cast("long")
                * F.lit(step_us)
            )

    # Single-window formulation: instead of (latest-per-bucket rank
    # window) + (grid left join) + (forward-fill window) — three
    # exchanges — union the grid rows under the observations and read
    # the carried value off ONE forward-fill window partitioned on the
    # group key.  Within a bucket, observations sort before the grid
    # row (ordered by time, so the latest wins), making "value at
    # bucket = latest observation at-or-before bucket end" fall out of
    # plain last(ignorenulls).
    bounds = df.groupBy(*group_cols).agg(
        bucket_of(F.min(time_col)).alias("__lo"),
        bucket_of(F.max(time_col)).alias("__hi"),
    )
    dense = bounds.select(
        *group_cols,
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"INTERVAL {step}"))
        ).alias("__bucket"),
    ).select(
        *group_cols,
        "__bucket",
        F.lit(None).cast(df.schema[time_col].dataType).alias("__ts"),
        F.lit(None).cast(df.schema[value_col].dataType).alias("__v"),
        F.lit(1).alias("__is_grid"),
    )
    obs = df.select(
        *group_cols,
        bucket_of(F.col(time_col)).alias("__bucket"),
        F.col(time_col).alias("__ts"),
        F.col(value_col).alias("__v"),
        F.lit(0).alias("__is_grid"),
    )
    unioned = obs.unionByName(dense)

    w_ff = (
        Window.partitionBy(*group_cols)
        .orderBy("__bucket", "__is_grid", "__ts", "__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_v = F.last("__v", ignorenulls=True).over(w_ff)
    last_obs_bucket = F.last(
        F.when(F.col("__is_grid") == 0, F.col("__bucket")), ignorenulls=True
    ).over(w_ff)
    return (
        unioned.select(
            *group_cols,
            F.col("__bucket").alias("bucket"),
            last_v.alias(out_col),
            (last_obs_bucket == F.col("__bucket")).alias("was_observed"),
            "__is_grid",
        )
        .filter(F.col("__is_grid") == 1)
        .drop("__is_grid")
    )


def scd2_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_col: str,
    change_col: Column | None = None,
) -> DataFrame:
    """Compress a keyed change log into SCD2 validity intervals.

    Input: one row per (key, ts) observation of ``attr_col`` (ties on
    ``ts`` resolve to an arbitrary-but-deterministic winner via a
    secondary sort on the attribute).  Output: one row per *run* of
    consecutive equal values with ``valid_from`` (first ts of the run),
    ``valid_to`` (next run's start, NULL for the current value) and
    ``is_current``.  NULL-safe: a NULL attribute value is a run of its
    own (``eqNullSafe`` comparison).
    """
    key_cols = list(key_cols)
    w = Window.partitionBy(*key_cols).orderBy(ts_col, attr_col)
    prev = F.lag(attr_col).over(w)
    is_change = F.when(
        F.row_number().over(w) == 1, F.lit(True)
    ).otherwise(~F.col(attr_col).eqNullSafe(prev))

    changes = (
        df.select(*key_cols, ts_col, attr_col)
        .withColumn("__chg", change_col if change_col is not None else is_change)
        .filter(F.col("__chg"))
        .drop("__chg")
    )
    # same secondary sort as the change-detection window: with duplicate
    # (key, ts) rows carrying different attributes, lead() over a
    # ts-only ordering is nondeterministic about which row receives the
    # degenerate [ts, ts) interval — (ts, attr) makes every run
    # reproducible across partitionings and engines (the oracle's lead()
    # carries the identical ordering)
    w2 = Window.partitionBy(*key_cols).orderBy(ts_col, attr_col)
    return changes.select(
        *key_cols,
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def seasonal_residual_anomalies(
    df: DataFrame,
    group_cols: Sequence[str],
    bucket_col: str,
    value_col: str,
    season_lag: int = 7,
    threshold: float = 3.5,
) -> DataFrame:
    """Seasonal-naive anomaly flags for a regular per-bucket series:
    expected = value ``season_lag`` buckets back (same weekday last
    week for daily data), residual = value − expected, and a bucket is
    anomalous when its modified z-score ``0.6745·|r − median(r)| /
    MAD(r)`` (computed per group over all residuals) exceeds
    ``threshold``.

    The robust location/scale makes the monitor itself immune to the
    anomalies it is hunting — the mean/stddev version lets one big
    spike inflate the fence and mask the next spike.  Two window
    passes + one tiny per-group stats broadcast; exact interpolated
    medians over integer-count residuals keep every flag
    engine-reproducible (same recipe as outliers.mad_outliers).  When
    MAD degenerates to 0 (over half the residuals identical — the
    perfectly periodic baseline), any residual differing from the
    median is flagged.  Buckets with no seasonal predecessor emit NULL
    residual and are never flagged.
    """
    group_cols = list(group_cols)
    w = Window.partitionBy(*group_cols).orderBy(bucket_col)
    r = (
        df.withColumn("expected", F.lag(value_col, season_lag).over(w))
        .withColumn(
            "residual", F.col(value_col) - F.col("expected")
        )
    )
    med = r.filter(F.col("residual").isNotNull()).groupBy(*group_cols).agg(
        F.percentile(F.col("residual"), F.lit(0.5)).alias("__med")
    )
    mad = (
        r.join(F.broadcast(med), group_cols)
        .filter(F.col("residual").isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.first("__med").alias("__med"),
            F.percentile(
                F.abs(F.col("residual") - F.col("__med")), F.lit(0.5)
            ).alias("__mad"),
        )
    )
    z = F.lit(0.6745) * (F.col("residual") - F.col("__med")) / F.col("__mad")
    return (
        r.join(F.broadcast(mad), group_cols, "left")
        .select(
            *group_cols,
            F.col(bucket_col),
            F.col(value_col),
            "expected",
            "residual",
            F.when(
                F.col("residual").isNotNull() & (F.col("__mad") != 0),
                F.abs(z) > threshold,
            ).when(
                # MAD = 0: over half the residuals are identical (a
                # perfectly periodic baseline) — ANY departure from
                # that majority value is anomalous
                F.col("residual").isNotNull() & (F.col("__mad") == 0),
                ~F.col("residual").eqNullSafe(F.col("__med")),
            ).otherwise(F.lit(False)).alias("is_anomaly"),
        )
    )
