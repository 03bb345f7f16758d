"""k-anonymity generalization ladder (operators/anonymize.py)."""

import pytest
from pyspark.sql import functions as F

from gdp_etl_spark.operators.anonymize import k_anonymize


def _ladder():
    return [
        {"city": F.col("city"), "age": (F.floor(F.col("age") / 10) * 10)},
        {"city": F.lit("*"), "age": (F.floor(F.col("age") / 20) * 20)},
    ]


def test_k_anonymize_levels_and_suppression(spark):
    rows = [
        # 3 in (paris, 30s) -> level 0
        (1, "paris", 31), (2, "paris", 35), (3, "paris", 39),
        # singles at level 0; (*, 20) class of 2 at level 1
        (4, "lyon", 22), (5, "nice", 25),
        # never reaches k=2 -> suppressed
        (6, "oslo", 99),
    ]
    df = spark.createDataFrame(rows, "id bigint, city string, age int")
    out = k_anonymize(df, _ladder(), k=3, id_col="id")
    got = {r.id: (r.city, r.age, r.anon_level, r.suppressed)
           for r in out.collect()}
    assert got[1] == ("paris", "30", 0, False)
    assert got[2] == ("paris", "30", 0, False)
    assert got[3] == ("paris", "30", 0, False)
    # k=3: the two 20-somethings don't reach k at level 1 -> suppressed
    assert got[4] == (None, None, 2, True)
    assert got[6] == (None, None, 2, True)
    assert len(got) == 6

    # with k=2 the level-1 class (*, 20) emits
    out2 = {r.id: (r.city, r.age, r.anon_level, r.suppressed)
            for r in k_anonymize(df, _ladder(), k=2, id_col="id").collect()}
    assert out2[4] == ("*", "20", 1, False)
    assert out2[5] == ("*", "20", 1, False)
    assert out2[6] == (None, None, 2, True)


def test_k_anonymize_guarantee_on_real_table(spark):
    """Every emitted non-suppressed (level, QI...) class has >= k rows,
    and ids are preserved exactly once."""
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    ladder = [
        {
            "nation": F.col("c_nationkey").cast("string"),
            "segment": F.col("c_mktsegment"),
            "balance": (F.floor(F.col("c_acctbal") / 1000) * 1000),
        },
        {
            "nation": F.lit("*"),
            "segment": F.col("c_mktsegment"),
            "balance": (F.floor(F.col("c_acctbal") / 5000) * 5000),
        },
    ]
    k = 5
    out = k_anonymize(cust, ladder, k=k, id_col="c_custkey")
    rows = out.collect()
    assert len(rows) == cust.count()
    assert len({r.c_custkey for r in rows}) == len(rows)
    from collections import Counter
    classes = Counter(
        (r.anon_level, r.nation, r.segment, r.balance)
        for r in rows if not r.suppressed
    )
    assert classes and all(v >= k for v in classes.values())


def test_k_anonymize_validation(spark):
    df = spark.createDataFrame([(1, "a", 2)], "id bigint, city string, age int")
    with pytest.raises(ValueError, match="k must"):
        k_anonymize(df, _ladder(), k=1, id_col="id")
    with pytest.raises(ValueError, match="at least one"):
        k_anonymize(df, [], k=2, id_col="id")
    bad = [_ladder()[0], {"city": F.lit("*")}]
    with pytest.raises(ValueError, match="must match level 0"):
        k_anonymize(df, bad, k=2, id_col="id")
    clash = df.withColumn("anon_level", F.lit(1))
    with pytest.raises(ValueError, match="anon_level"):
        k_anonymize(clash, _ladder(), k=2, id_col="id")
