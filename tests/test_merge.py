"""Snapshot merge (upsert) semantics."""

import pytest

from gdp_etl_spark.operators.merge import merge_upsert


def test_merge_upsert_classification(spark):
    target = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c"), (4, None, "d")],
        "k long, v double, s string",
    )
    source = spark.createDataFrame(
        [(2, 21.0, "b"),      # value change -> update
         (3, 30.0, "c"),      # identical -> unchanged
         (4, None, "d"),      # NULL == NULL (null-safe) -> unchanged
         (5, 50.0, "e")],     # new key -> insert
        "k long, v double, s string",
    )
    got = {r["k"]: r for r in merge_upsert(target, source, keys=["k"]).collect()}
    assert got[1]["change"] == "delete" and got[1]["v"] == 10.0
    assert got[2]["change"] == "update" and got[2]["v"] == 21.0
    assert got[3]["change"] == "unchanged"
    assert got[4]["change"] == "unchanged"
    assert got[5]["change"] == "insert" and got[5]["v"] == 50.0


def test_merge_source_null_wins(spark):
    """A source row explicitly setting NULL must override the target
    value (presence-gated select, not coalesce)."""
    target = spark.createDataFrame([(1, 10.0)], "k long, v double")
    source = spark.createDataFrame([(1, None)], "k long, v double")
    r = merge_upsert(target, source, keys=["k"]).collect()[0]
    assert r["v"] is None and r["change"] == "update"


# ---------------------------------------------------------------------------
# CDC change-log application (operators.cdc)
# ---------------------------------------------------------------------------

def _cdc(spark):
    from gdp_etl_spark.operators.cdc import apply_changes, latest_changes
    return apply_changes, latest_changes


def test_cdc_latest_changes_out_of_order(spark):
    _, latest_changes = _cdc(spark)
    log = spark.createDataFrame(
        [(1, 3, "update", 30.0), (1, 1, "insert", 10.0),
         (1, 2, "update", 20.0), (2, 5, "insert", 50.0)],
        "k long, seq long, op string, v double",
    )
    got = sorted(
        tuple(r) for r in latest_changes(log, ["k"], "seq").collect()
    )
    assert got == [(1, 3, "update", 30.0), (2, 5, "insert", 50.0)]
    # same result under any partitioning
    got2 = sorted(
        tuple(r)
        for r in latest_changes(log.repartition(4), ["k"], "seq").collect()
    )
    assert got == got2


def test_cdc_delete_beats_update_on_equal_seq(spark):
    _, latest_changes = _cdc(spark)
    log = spark.createDataFrame(
        [(1, 7, "update", 1.0), (1, 7, "delete", None)],
        "k long, seq long, op string, v double",
    )
    [(op,)] = latest_changes(log, ["k"], "seq").select("op").collect()
    assert op == "delete"


def test_cdc_apply_changes_semantics(spark):
    apply_changes, _ = _cdc(spark)
    snap = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c")],
        "k long, v double, tag string",
    )
    log = spark.createDataFrame(
        [
            (2, 1, "delete", None, None),          # drop key 2
            (3, 1, "update", None, "c2"),          # explicit NULL wins
            (4, 1, "insert", 40.0, "d"),           # brand-new key
            (4, 2, "update", 44.0, "d2"),          # superseded by seq 2
        ],
        "k long, seq long, op string, v double, tag string",
    )
    got = sorted(tuple(r) for r in apply_changes(snap, log, ["k"], "seq").collect())
    assert got == [
        (1, 10.0, "a"),        # untouched carries over
        (3, None, "c2"),       # NULL update won
        (4, 44.0, "d2"),       # latest insert+update compacted
    ]


def test_cdc_malformed_events_raise(spark):
    """Unknown op, NULL op (three-valued-logic trap: NULL fails isin
    with NULL, not false), and NULL key must ALL raise — including when
    the bad event is superseded by a later one (validation runs before
    compaction, so a producer bug surfaces instead of being silently
    discarded)."""
    apply_changes, _ = _cdc(spark)
    snap = spark.createDataFrame([(1, 10.0)], "k long, v double")
    schema = "k long, seq long, op string, v double"
    for bad_log in (
        [(1, 1, "upsert", 11.0)],                       # unknown op
        [(1, 1, None, 11.0)],                           # NULL op
        [(None, 1, "insert", 11.0)],                    # NULL key
        [(1, 1, "upsert", 11.0), (1, 2, "update", 12.0)],  # superseded bad
    ):
        log = spark.createDataFrame(bad_log, schema)
        with pytest.raises(Exception, match="malformed change event"):
            apply_changes(snap, log, ["k"], "seq").collect()


def test_cdc_equal_seq_same_op_deterministic(spark):
    """Two non-delete events sharing (key, seq) must resolve to the
    SAME survivor under any partitioning (content-hash tie-break) —
    the redelivery-idempotence contract of the streaming sink."""
    _, latest_changes = _cdc(spark)
    log = spark.createDataFrame(
        [(1, 7, "update", 10.0), (1, 7, "update", 20.0)],
        "k long, seq long, op string, v double",
    )
    first = sorted(
        tuple(r) for r in latest_changes(log, ["k"], "seq").collect()
    )
    for nparts in (1, 3, 5):
        again = sorted(
            tuple(r)
            for r in latest_changes(
                log.repartition(nparts), ["k"], "seq"
            ).collect()
        )
        assert again == first
