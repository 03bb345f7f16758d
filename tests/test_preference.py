"""Preference-pair construction (operators/preference.py)."""

import pytest
from pyspark.sql import functions as F

from gdp_etl_spark.operators.preference import preference_pairs

from .conftest import spark  # noqa: F401


def _resp(spark):
    # prompt 1: clear order; prompt 2: tie at the top; prompt 3: single
    # response; prompt 4: all equal (no strict preference)
    return spark.createDataFrame(
        [
            (1, 10, 0.9), (1, 11, 0.5), (1, 12, 0.1),
            (2, 20, 0.8), (2, 21, 0.8), (2, 22, 0.2),
            (3, 30, 0.7),
            (4, 40, 0.4), (4, 41, 0.4),
        ],
        "prompt_id bigint, resp_id bigint, score double",
    )


def test_extreme_pairs_tiebreaks_and_gap(spark):
    out = {r.prompt_id: r for r in preference_pairs(
        _resp(spark), "prompt_id", "resp_id", "score"
    ).collect()}
    # prompt 1: best 10 vs worst 12
    assert (out[1].chosen_id, out[1].rejected_id) == (10, 12)
    assert out[1].gap == pytest.approx(0.8)
    # prompt 2: top tie 0.8 breaks to the SMALLER id (20)
    assert (out[2].chosen_id, out[2].rejected_id) == (20, 22)
    # prompt 3 (single response) and 4 (all-tie) emit nothing
    assert 3 not in out and 4 not in out
    # min_gap filters prompt 2 (gap 0.6) but not prompt 1 (gap 0.8)
    gapped = {r.prompt_id for r in preference_pairs(
        _resp(spark), "prompt_id", "resp_id", "score", min_gap=0.7
    ).collect()}
    assert gapped == {1}


def test_all_pairs_strict_and_guarded(spark):
    out = preference_pairs(
        _resp(spark), "prompt_id", "resp_id", "score", mode="all"
    ).collect()
    got = {(r.prompt_id, r.chosen_id, r.rejected_id) for r in out}
    # prompt 1: all 3 strict pairs; prompt 2: ties never pair
    assert {(1, 10, 11), (1, 10, 12), (1, 11, 12)} <= got
    assert (2, 20, 21) not in got and (2, 21, 20) not in got
    assert {(2, 20, 22), (2, 21, 22)} <= got
    assert not [t for t in got if t[0] in (3, 4)]
    # every emitted pair is strictly ordered
    for r in out:
        assert r.chosen_score > r.rejected_score and r.gap > 0
    # group-size contract raises loudly
    from pyspark.errors import SparkRuntimeException

    with pytest.raises(SparkRuntimeException, match="max_group_size"):
        preference_pairs(
            _resp(spark), "prompt_id", "resp_id", "score",
            mode="all", max_group_size=2,
        ).collect()


def test_null_score_and_mode_validation(spark):
    from pyspark.errors import SparkRuntimeException

    withnull = spark.createDataFrame(
        [(1, 10, 0.5), (1, 11, None)],
        "prompt_id bigint, resp_id bigint, score double",
    )
    with pytest.raises(SparkRuntimeException, match="NULL score"):
        preference_pairs(
            withnull, "prompt_id", "resp_id", "score"
        ).collect()
    with pytest.raises(ValueError, match="mode"):
        preference_pairs(_resp(spark), "prompt_id", "resp_id", "score",
                         mode="best")
