#!/usr/bin/env python3
"""SCALE probe: three designs for exact grouped top-k under skew.

One key holds 50% of rows.  Designs measured (warm medians of 3):

  A. plain row_number window + filter (skew.grouped_topk) — Catalyst's
     rank-limit pushdown (SPARK-37099) inserts a Partial
     WindowGroupLimit that prunes to ≤k rows per (key, input
     partition) MAP-SIDE, before the exchange;
  B. salted two-level window — row_number over (key, hash(id)%16),
     keep ≤k, then row_number over key: the "de-skew by hand" shape;
  C. salted collect_list arrays — groupBy (key, salt) collecting
     (order, id, payload) structs, array_sort+slice, merge: the
     object-aggregation shape.

This probe is the evidence behind grouped_topk's docstring: the
optimizer's A wins, so the operator deliberately IS the plain window.

Run: python tools/probe_grouped_topk.py [--rows 2000000]
"""
from __future__ import annotations

import argparse
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gdp_etl_spark.operators.skew import grouped_topk
    from gdp_etl_spark.session import get_spark

    spark = get_spark("probe-topk", master="local[32]", shuffle_partitions=32)
    K, SALTS = 10, 16

    def design_b(df):
        w1 = Window.partitionBy(
            "k", F.pmod(F.xxhash64("id"), F.lit(SALTS))
        ).orderBy(F.col("v").desc_nulls_last(), "id")
        w2 = Window.partitionBy("k").orderBy(
            F.col("v").desc_nulls_last(), "id"
        )
        return (
            df.withColumn("__rn", F.row_number().over(w1))
            .filter(F.col("__rn") <= K)
            .withColumn("__rn", F.row_number().over(w2))
            .filter(F.col("__rn") <= K)
            .drop("__rn")
        )

    def design_c(df):
        item = F.struct(
            F.coalesce(F.col("v"), F.lit(float("-inf"))).alias("__o"),
            F.col("id").alias("__t"),
            F.struct("k", "id", "v").alias("__r"),
        )
        cmp_ = lambda a, b: (
            F.when(a["__o"] > b["__o"], F.lit(-1))
            .when(a["__o"] < b["__o"], F.lit(1))
            .when(a["__t"] < b["__t"], F.lit(-1))
            .when(a["__t"] > b["__t"], F.lit(1)).otherwise(F.lit(0))
        )
        topk = lambda arr: F.slice(F.array_sort(arr, cmp_), 1, K)
        salted = df.groupBy(
            "k", F.pmod(F.xxhash64("id"), F.lit(SALTS)).alias("__s")
        ).agg(topk(F.collect_list(item)).alias("__a"))
        merged = salted.groupBy("k").agg(
            topk(F.flatten(F.collect_list("__a"))).alias("__a")
        )
        return merged.select(F.explode("__a").alias("e")).select("e.__r.*")

    for n in (args.rows // 10, args.rows, args.rows * 10):
        df = spark.range(n).select(
            F.when(F.col("id") % 2 == 0, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 1000).cast("string")))
            .alias("k"),
            F.col("id"),
            (F.col("id") % 9973).cast("double").alias("v"),
        ).localCheckpoint(eager=True)

        def med(fn):
            ts = []
            for _ in range(3):
                t0 = time.time()
                fn()
                ts.append(time.time() - t0)
            return statistics.median(ts)

        t_a = med(lambda: grouped_topk(df, ["k"], "v", "id", k=K).count())
        t_b = med(lambda: design_b(df).count())
        t_c = med(lambda: design_c(df).count())
        print(f"rows={n:>10,} (hot={n // 2:,}): "
              f"A window+WGL {t_a:.1f}s | B salted window {t_b:.1f}s | "
              f"C salted arrays {t_c:.1f}s")
        df.unpersist()


if __name__ == "__main__":
    main()
