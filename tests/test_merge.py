"""Snapshot merge (upsert) semantics."""

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
