"""Physical-plan quality guards: the properties that make these queries
survive a 100× scale-up must hold in the compiled plan, not just in
intent.  A regression that drops a pushdown or introduces a cartesian
join fails here before it ever reaches a benchmark."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as e
from gdp_etl_spark.operators.similarity import brute_force_topk, ivf_topk
from gdp_etl_spark.functions.text import rolling_content_hash

from .conftest import rows

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_flagship_pushes_band_filter_to_scan(spark):
    df = e.q_flagship_revenue(spark, SF)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual" in plan
    # column pruning: the lineitem scan must not read all 11 columns
    assert "l_comment" not in plan
    assert "l_partkey" not in plan


def test_flagship_broadcasts_dimensions(spark):
    plan = _plan(e.q_flagship_revenue(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_topk_plans_take_ordered(spark):
    plan = _plan(e.q_topk_orders(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_no_cartesian_in_bucketed_dedup(spark):
    # LSH/blocked paths must never degenerate to a cross join
    for q in ("minhash_lsh", "ngram_jaccard", "simhash_pairs"):
        plan = _plan(e.queries()[q](spark, SF))
        assert "CartesianProduct" not in plan, q


def test_projection_prunes_scan_schema(spark):
    plan = _plan(e.q_projection(spark, SF))
    assert "o_orderdate" not in plan  # unused column never scanned


def test_rollup_closure_joins_are_broadcast(spark):
    plan = _plan(e.q_rollup_hierarchy(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# new operators: ivf / rolling hash
# ---------------------------------------------------------------------------
def test_ivf_topk_recall_and_determinism(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    exact = {
        (r["query_id"], r["neighbour_id"])
        for r in brute_force_topk(q, emb, k=5).collect()
    }
    a = {
        (r["query_id"], r["neighbour_id"])
        for r in ivf_topk(emb, q, k=5, num_centroids=4, nprobe=4).collect()
    }
    b = {
        (r["query_id"], r["neighbour_id"])
        for r in ivf_topk(emb, q, k=5, num_centroids=4, nprobe=4).collect()
    }
    assert a == b  # deterministic
    # probing every cell (nprobe == num_centroids) must be exact
    assert a == exact


def test_rolling_content_hash_known_value(spark):
    df = spark.createDataFrame([(1, "ab"), (2, None), (3, "")], "id long, t string")
    got = dict(rows(df.select("id", rolling_content_hash(F.col("t")).alias("h"))))
    # h("ab") = (0*31+97)*31 + 98 = 3105
    assert got == {1: 3105, 2: 0, 3: 0}


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Bucketing both sides of a repeated join key removes the Exchange:
    the defining co-location property at 100-TB scale."""
    from gdp_etl_spark.io import write_bucketed_table

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    try:
        # force the sort-merge path: broadcast would also avoid the
        # shuffle but says nothing about bucket co-location
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed_table(li, "li_b", ["l_orderkey"], num_buckets=4)
        write_bucketed_table(o, "o_b", ["o_orderkey"], num_buckets=4)
        joined = spark.table("li_b").join(
            spark.table("o_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        # and it still computes the right thing
        assert joined.count() == li.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")
