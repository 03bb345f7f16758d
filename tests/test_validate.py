"""Data-quality check suite: each rule kind catches planted violations."""

import pytest

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


def test_drift_psi_zero_for_identical_and_positive_for_shifted(spark):
    from pyspark.sql import functions as F

    from gdp_etl_spark.operators.profile import drift_psi

    base = spark.range(0, 1000).select((F.col("id") % 100).cast("double").alias("x"))
    same = drift_psi(base, base, "x", nbins=10)
    total_same = same.agg(F.sum("psi_contrib")).first()[0]
    assert abs(total_same) < 1e-12

    shifted = base.select((F.col("x") + 50.0).alias("x"))  # half out of range
    total_shift = (
        drift_psi(base, shifted, "x", nbins=10)
        .agg(F.sum("psi_contrib"))
        .first()[0]
    )
    assert total_shift > 0.2  # rule-of-thumb alert threshold


def test_drift_psi_out_of_range_values_clamp_to_edge_bins(spark):
    from gdp_etl_spark.operators.profile import drift_psi

    ref = spark.createDataFrame([(0.0,), (10.0,)], "x double")
    cur = spark.createDataFrame([(-100.0,), (100.0,)], "x double")
    got = {r["bin"]: r["n_cur"] for r in drift_psi(ref, cur, "x", nbins=5).collect()}
    assert got[0] == 1 and got[4] == 1
    assert sum(got.values()) == 2


def test_category_drift_zero_when_mix_unchanged_and_detects_shift(spark):
    from pyspark.sql import functions as F

    from gdp_etl_spark.operators.profile import category_drift

    base = spark.createDataFrame(
        [("a",)] * 60 + [("b",)] * 40, "c string"
    )
    same = category_drift(base, base, "c")
    assert same.agg(F.sum("chi2_contrib")).first()[0] == pytest.approx(0.0)
    shifted = spark.createDataFrame([("a",)] * 40 + [("b",)] * 60, "c string")
    chi2 = (
        category_drift(base, shifted, "c").agg(F.sum("chi2_contrib")).first()[0]
    )
    assert chi2 > 3.84  # > chi2(dof=1) 95% critical value


def test_category_drift_handles_one_sided_categories(spark):
    from gdp_etl_spark.operators.profile import category_drift

    ref = spark.createDataFrame([("a",), ("b",)], "c string")
    cur = spark.createDataFrame([("a",), ("z",)], "c string")
    got = {r["category"]: (r["n_ref"], r["n_cur"])
           for r in category_drift(ref, cur, "c").collect()}
    assert got == {"a": (1, 1), "b": (1, 0), "z": (0, 1)}


def test_quarantine_orphans_partitions_the_frame_exactly(spark):
    from gdp_etl_spark.operators.validate import quarantine_orphans

    child = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "zz"), (4, "a")], "id int, k string"
    )
    dim = spark.createDataFrame([("a",), ("b",)], "dim_k string")
    valid, orphans = quarantine_orphans(child, dim, "k", "dim_k")
    assert sorted(r["id"] for r in valid.collect()) == [1, 2, 4]
    assert [r["id"] for r in orphans.collect()] == [3]
    assert valid.count() + orphans.count() == child.count()


def test_run_checks_rejects_empty_and_duplicate_rules(spark):
    import pytest

    from gdp_etl_spark.operators.validate import in_range, run_checks

    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(ValueError, match="at least one rule"):
        run_checks(df, [])
    with pytest.raises(ValueError, match="duplicate rule names"):
        run_checks(df, [in_range("x", 0, 1), in_range("x", 0, 2)])
