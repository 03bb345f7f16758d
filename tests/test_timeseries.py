"""Time-series regularization + SCD2 + histogram edge cases."""

from datetime import datetime

from pyspark.sql import functions as F

from gdp_etl_spark.operators.profile import equiwidth_histogram
from gdp_etl_spark.operators.timeseries import resample_locf, scd2_intervals

from .conftest import rows


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def test_resample_locf_fills_gaps_and_leaves_leading_null(spark):
    df = spark.createDataFrame(
        [
            ("a", _ts(1, 30), 10.0),   # bucket 01:00
            ("a", _ts(4, 10), 40.0),   # bucket 04:00 — 02:00/03:00 gap
            ("b", _ts(2, 0), 99.0),
        ],
        "g string, ts timestamp, v double",
    )
    got = rows(resample_locf(df, ["g"], "ts", "v", step="1 hour"))
    assert got == sorted(
        [
            ("a", _ts(1), 10.0, True),
            ("a", _ts(2), 10.0, False),   # carried forward
            ("a", _ts(3), 10.0, False),
            ("a", _ts(4), 40.0, True),
            ("b", _ts(2), 99.0, True),
        ]
    )


def test_resample_locf_latest_observation_in_bucket_wins(spark):
    df = spark.createDataFrame(
        [("a", _ts(1, 5), 1.0), ("a", _ts(1, 55), 2.0)],
        "g string, ts timestamp, v double",
    )
    got = rows(resample_locf(df, ["g"], "ts", "v", step="1 hour"))
    assert got == [("a", _ts(1), 2.0, True)]


def test_scd2_collapses_consecutive_equal_values(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(1), "x"),
            (1, _ts(2), "x"),   # no change — collapsed into the first run
            (1, _ts(3), "y"),
            (1, _ts(4), "x"),   # x returns — new run, not merged
        ],
        "k int, ts timestamp, attr string",
    )
    got = rows(scd2_intervals(df, ["k"], "ts", "attr"))
    assert sorted(got, key=lambda t: t[2]) == [
        (1, "x", _ts(1), _ts(3), False),
        (1, "y", _ts(3), _ts(4), False),
        (1, "x", _ts(4), None, True),
    ]


def test_scd2_null_attribute_is_its_own_run(spark):
    df = spark.createDataFrame(
        [(1, _ts(1), "x"), (1, _ts(2), None), (1, _ts(3), None), (1, _ts(4), "x")],
        "k int, ts timestamp, attr string",
    )
    got = [tuple(r) for r in scd2_intervals(df, ["k"], "ts", "attr").collect()]
    assert (1, None, _ts(2), _ts(4), False) in got
    assert len(got) == 3  # x / NULL / x — consecutive NULLs collapsed


def test_histogram_emits_empty_bins_and_clamps_max(spark):
    df = spark.createDataFrame([(0.0,), (1.0,), (10.0,), (None,)], "x double")
    got = rows(equiwidth_histogram(df, "x", nbins=5))  # width 2.0
    by_bin = {r[0]: r[3] for r in got}
    assert len(got) == 5
    assert by_bin == {0: 2, 1: 0, 2: 0, 3: 0, 4: 1}  # max lands IN last bin
    lo0 = [r for r in got if r[0] == 0][0]
    assert (lo0[1], lo0[2]) == (0.0, 2.0)


def test_mad_outliers_zero_mad_group_reports_null(spark):
    from gdp_etl_spark.operators.outliers import mad_outliers

    df = spark.createDataFrame(
        [("a", 1.0)] * 5 + [("a", 100.0), ("b", 1.0), ("b", 2.0), ("b", 3.0)],
        "g string, x double",
    )
    got = {r["g"]: r for r in mad_outliers(df, "x", ["g"]).collect()}
    assert got["a"]["mad"] == 0.0 and got["a"]["n_outliers"] is None
    assert got["b"]["mad"] == 1.0 and got["b"]["n_outliers"] == 0


def test_histogram_all_equal_values_land_in_bin_zero(spark):
    df = spark.createDataFrame([(5.0,), (5.0,), (5.0,)], "x double")
    got = rows(equiwidth_histogram(df, "x", nbins=4))
    assert {r[0]: r[3] for r in got} == {0: 3, 1: 0, 2: 0, 3: 0}


def test_equidepth_histogram_balances_counts_and_keeps_ties_together(spark):
    from gdp_etl_spark.operators.profile import equidepth_histogram

    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    got = rows(equidepth_histogram(df, "x", nbins=4))
    assert [r[3] for r in got] == [25, 25, 25, 25]
    assert got[0][1] == 0.0 and got[-1][2] == 99.0

    # heavy hitter spanning quantiles: ties stay in one bin
    hh = spark.createDataFrame([(1.0,)] * 90 + [(2.0,), (3.0,)], "x double")
    got2 = rows(equidepth_histogram(hh, "x", nbins=4))
    assert sum(r[3] for r in got2) == 92
    assert got2[0][3] == 90  # all the tied 1.0s in bin 0


def test_resample_locf_multi_unit_step_lands_on_grid(spark):
    # "15 minutes": date_trunc('minute') would put observations on
    # minute buckets that never coincide with the epoch-aligned 15-min
    # grid; epoch-floor bucketing must mark the right buckets observed
    df = spark.createDataFrame(
        [
            ("a", _ts(1, 7), 1.0),
            ("a", _ts(1, 40), 2.0),
            ("a", _ts(2, 6), 3.0),
        ],
        "g string, ts timestamp, v double",
    )
    got = rows(resample_locf(df, ["g"], "ts", "v", step="15 minutes"))
    # epoch-aligned grid (F.window convention): lo = floor(01:07) =
    # 01:00, hi = floor(02:06) = 02:00; grid = 01:00..02:00 by 15 min.
    # Buckets: obs 01:07 -> 01:00; 01:40 -> 01:30; 02:06 -> 02:00.
    assert got == sorted(
        [
            ("a", _ts(1, 0), 1.0, True),
            ("a", _ts(1, 15), 1.0, False),
            ("a", _ts(1, 30), 2.0, True),
            ("a", _ts(1, 45), 2.0, False),
            ("a", _ts(2, 0), 3.0, True),
        ]
    )


def test_resample_locf_multi_unit_calendar_step_rejected(spark):
    import pytest

    df = spark.createDataFrame(
        [("a", _ts(1), 1.0)], "g string, ts timestamp, v double"
    )
    with pytest.raises(ValueError, match="multi-unit"):
        resample_locf(df, ["g"], "ts", "v", step="3 months")


def test_scd2_duplicate_key_ts_ties_are_deterministic(spark):
    # two rows with the same (key, ts) but different attrs: both survive
    # the change filter; the (ts, attr) secondary sort pins which one
    # gets the degenerate [ts, ts) interval on every run/partitioning
    df = spark.createDataFrame(
        [
            (1, _ts(1), "B"),
            (1, _ts(1), "A"),
            (1, _ts(3), "C"),
        ],
        "k int, ts timestamp, attr string",
    )
    got = rows(scd2_intervals(df, ["k"], "ts", "attr"))
    assert got == sorted(
        [
            (1, "A", _ts(1), _ts(1), False),   # degenerate: A sorts first
            (1, "B", _ts(1), _ts(3), False),
            (1, "C", _ts(3), None, True),
        ]
    )


class TestSeasonalAnomalies:
    def test_flags_spike_not_baseline(self, spark):
        from gdp_etl_spark.operators.timeseries import (
            seasonal_residual_anomalies,
        )

        # 4 weeks of perfectly weekly-periodic counts + one big spike
        rows = []
        for day in range(28):
            base = 100 + (day % 7) * 10
            rows.append(("a", day, base + (500 if day == 20 else 0)))
        df = spark.createDataFrame(rows, "g string, day int, n long")
        out = {r["day"]: r for r in
               seasonal_residual_anomalies(df, ["g"], "day", "n").collect()}
        assert all(out[d]["residual"] is None for d in range(7))   # no lag-7
        flagged = [d for d in range(28) if out[d]["is_anomaly"]]
        # the spike day AND its seasonal echo (day 27 compares against
        # the spiked day 20) are the anomalous residuals
        assert flagged == [20, 27]
        assert out[20]["expected"] == 160 and out[20]["residual"] == 500
        assert not out[13]["is_anomaly"]
