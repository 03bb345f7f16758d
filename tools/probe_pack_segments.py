"""Design probe for packing.pack_segments: two-pass prefix-sum vs the
naive global-window cumsum at 20M documents.

The packer needs every document's exclusive global token offset in a
deterministic order.  The obvious SQL is
``SUM(n) OVER (ORDER BY h, id ROWS UNBOUNDED PRECEDING)`` — which
Spark executes by moving the ENTIRE table through one task (the
"No Partition Defined" warning is a scale death sentence, not a
nuisance).  pack_segments instead range-partitions on the hash,
prefix-sums per-partition token totals (statistics-scale), and ranks
locally — the assign_row_ids recipe with token sums.

Usage: python tools/probe_pack_segments.py [n_rows]
Writes nothing; numbers go to SCALE.md by hand.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    seq_len = 2048

    from gdp_etl_spark.operators.packing import pack_segments
    from gdp_etl_spark.session import get_spark

    spark = get_spark("pack-probe", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.lit(50) + F.pmod(F.col("id"), F.lit(100))).alias("n_tok"),
    ).localCheckpoint()

    t0 = time.time()
    out = pack_segments(docs, "doc_id", "n_tok", seq_len)
    n_seg = out.count()
    t_prefix = time.time() - t0
    print(f"pack_segments (two-pass prefix-sum): {t_prefix:.1f} s, "
          f"{n_seg:,} segments")

    # the naive form: identical semantics, one global window
    t0 = time.time()
    h = F.md5(F.concat_ws(":", F.col("doc_id").cast("string"),
                          F.lit("0:pack")))
    w = Window.orderBy("__h", "doc_id").rowsBetween(
        Window.unboundedPreceding, -1)
    L = F.lit(seq_len).cast("long")
    naive = (
        docs.withColumn("__h", h)
        .withColumn("__begin",
                    F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
        .withColumn("__end", F.col("__begin") + F.col("n_tok"))
        .select(F.explode(F.sequence(
            F.floor(F.col("__begin") / L).cast("long"),
            F.floor((F.col("__end") - 1) / L).cast("long"),
        )).alias("pack_id"))
    )
    n_naive = naive.count()
    t_naive = time.time() - t0
    print(f"naive global window:                 {t_naive:.1f} s, "
          f"{n_naive:,} segments")
    print(f"ratio: {t_naive / t_prefix:.1f}x")


if __name__ == "__main__":
    main()
