#!/usr/bin/env python3
"""SCALE probe: grouped_topk (salted two-phase) vs row_number window
under the dominant-key shape (one key holds 50% of rows).

Same method as the round-8 grouped_ntile probe: synthetic rows with a
planted hot key, generation isolated via localCheckpoint, noop-style
count action, warm medians of 3.

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

    for n in (args.rows // 10, args.rows, args.rows * 10):
        # 50% of rows in key 'hot', the rest spread over 1000 keys
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

        t_salted = med(lambda: grouped_topk(df, ["k"], "v", "id", k=10).count())
        w = Window.partitionBy("k").orderBy(F.col("v").desc_nulls_last(), "id")
        t_window = med(
            lambda: df.withColumn("rn", F.row_number().over(w))
            .filter("rn <= 10").count()
        )
        print(f"rows={n:>9,} (hot={n // 2:,}): "
              f"grouped_topk {t_salted:.1f}s  window {t_window:.1f}s")
        df.unpersist()


if __name__ == "__main__":
    main()
