"""Property-based invariants (hypothesis) for the time-series and
distribution operators — randomized inputs, structural guarantees."""

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gdp_etl_spark.operators.profile import equiwidth_histogram
from gdp_etl_spark.operators.timeseries import resample_locf, scd2_intervals

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

BASE = datetime(2024, 1, 1)

#: (hour-offset, value) observations — unique hours per example
series = st.lists(
    st.tuples(st.integers(0, 72), st.floats(-100, 100, allow_nan=False)),
    min_size=1,
    max_size=15,
    unique_by=lambda t: t[0],
)


@given(obs=series)
@settings(**_SETTINGS)
def test_locf_covers_exactly_the_span_and_carries_values(spark, obs):
    df = spark.createDataFrame(
        [("g", BASE + timedelta(hours=h, minutes=30), v) for h, v in obs],
        "g string, ts timestamp, v double",
    )
    out = resample_locf(df, ["g"], "ts", "v", step="1 hour").collect()
    hours = sorted(h for h, _ in obs)
    # one row per hour across the observed span, no more, no fewer
    assert len(out) == hours[-1] - hours[0] + 1
    by_bucket = {r["bucket"]: r for r in out}
    vals = dict(obs)
    carried = None
    for h in range(hours[0], hours[-1] + 1):
        row = by_bucket[BASE + timedelta(hours=h)]
        if h in vals:
            carried = vals[h]
            assert row["was_observed"] is True
        else:
            assert row["was_observed"] is False
        assert row["v"] == carried


@given(
    log=st.lists(
        st.tuples(st.integers(0, 20), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
@settings(**_SETTINGS)
def test_scd2_intervals_tile_the_timeline_without_overlap(spark, log):
    df = spark.createDataFrame(
        [(1, BASE + timedelta(days=d), a) for d, a in log],
        "k int, ts timestamp, attr string",
    )
    out = sorted(
        scd2_intervals(df, ["k"], "ts", "attr").collect(),
        key=lambda r: r["valid_from"],
    )
    # first interval starts at the first observation; last is open
    assert out[0]["valid_from"] == BASE + timedelta(days=min(d for d, _ in log))
    assert out[-1]["valid_to"] is None and out[-1]["is_current"] is True
    for prev, nxt in zip(out, out[1:]):
        assert prev["valid_to"] == nxt["valid_from"]  # contiguous, no gaps
        assert prev["attr"] != nxt["attr"]  # runs truly collapsed


@given(
    xs=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False), min_size=2, max_size=40
    )
)
@settings(**_SETTINGS)
def test_histogram_conserves_mass_and_brackets_bounds(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    out = equiwidth_histogram(df, "x", nbins=7).collect()
    assert len(out) == 7
    assert sum(r["n"] for r in out) == len(xs)
    lo, hi = min(xs), max(xs)
    assert out[0]["lo"] == pytest.approx(lo)
    assert out[-1]["hi"] == pytest.approx(hi, rel=1e-12, abs=1e-9)
