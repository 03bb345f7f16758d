"""Data-quality check suite: each rule kind catches planted violations."""

from gdp_etl_spark.operators import validate as V


def _summary(df):
    return {r["rule"]: (r["kind"], r["n_violations"], r["n_checked"])
            for r in df.collect()}


def test_all_rule_kinds_count_planted_violations(spark):
    child = spark.createDataFrame(
        [
            (1, 10.0, "k1"),
            (2, -5.0, "k1"),     # range violation; duplicate key k1
            (None, 50.0, "k2"),  # null violation
            (4, None, "k3"),     # NULL value: range rule must NOT count it
            (5, 999.0, "zz"),    # orphan FK; range violation
        ],
        "id int, amount double, key string",
    )
    dim = spark.createDataFrame([("k1",), ("k2",), ("k3",)], "key string")
    got = _summary(
        V.run_checks(
            child,
            [
                V.not_null("id"),
                V.in_range("amount", 0.0, 100.0),
                V.unique("key"),
                V.foreign_key("key", dim, "key"),
            ],
        )
    )
    assert got["not_null_id"] == ("not_null", 1, 5)
    assert got["range_amount"] == ("in_range", 2, 5)
    # both rows of the duplicated key count as violations
    assert got["unique_key"] == ("unique", 2, 5)
    assert got["fk_key"] == ("foreign_key", 1, 5)


def test_clean_table_reports_zero_everywhere(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id int, v double")
    dim = spark.createDataFrame([(1,), (2,)], "id int")
    got = _summary(
        V.run_checks(
            df,
            [V.not_null("id"), V.in_range("v", 0, 10),
             V.unique("id"), V.foreign_key("id", dim, "id")],
        )
    )
    assert all(v[1] == 0 for v in got.values())
    assert all(v[2] == 2 for v in got.values())


def test_fk_with_differently_named_key_columns(spark):
    child = spark.createDataFrame([(7,), (8,)], "cust_ref int")
    dim = spark.createDataFrame([(7,)], "c_custkey int")
    got = _summary(
        V.run_checks(child, [V.foreign_key("cust_ref", dim, "c_custkey")])
    )
    assert got["fk_cust_ref"] == ("foreign_key", 1, 2)
