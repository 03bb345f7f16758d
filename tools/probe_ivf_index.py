#!/usr/bin/env python3
"""SCALE probe: the persisted IVF index across an ingest cycle.

Simulates a growing vector store: day 0 trains the coarse quantizer
and writes the index; N daily increments of ROWS vectors each append
their posting rows, assigned by the STORED centroids (no retrain).
Measures (warm medians) the probe latency after 1 vs N appends, the
file growth, and the effect of compaction — and verifies the probe
result is invariant under compaction.  The number to watch: append
cost tracks the INCREMENT (prior data never rescanned), and probe
cost after compaction returns to the day-1 figure (the accreted
small-file tax is maintenance debt, not query debt).

Run: python tools/probe_ivf_index.py [--appends 10] [--rows 200000]
"""
from __future__ import annotations

import argparse
import shutil
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--appends", type=int, default=10)
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gdp_etl_spark.operators.ann_index import (
        append_to_ivf_index,
        compact_ivf_index,
        ivf_probe_index,
        write_ivf_index,
    )
    from gdp_etl_spark.session import get_spark

    spark = get_spark("probe_ivf_index", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    n, days, dim = args.rows, args.appends, args.dim
    table = "probe_ivf_tbl"
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in (table, f"{table}__centroids"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)

    def day(i: int):
        # deterministic synthetic vectors in [-1, 1); ids disjoint/day
        return spark.range(i * n, (i + 1) * n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda j: (
                    (F.pmod(F.col("id") * 31 + j * 17, 1000) / 500.0 - 1.0)
                ).cast("float"),
            ).alias("embedding"),
        )

    def timed_probe():
        ts = []
        for _ in range(4):
            t0 = time.time()
            ivf_probe_index(
                spark, table, [0, 1, 2, 3, 4], k=10, nprobe=3
            ).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        return statistics.median(ts[1:])

    t0 = time.time()
    write_ivf_index(day(0), table, num_centroids=16, n_iter=2)
    t_write = time.time() - t0
    probe_1 = timed_probe()
    t_app = []
    for i in range(1, days):
        t0 = time.time()
        append_to_ivf_index(day(i), table)
        t_app.append(time.time() - t0)
    probe_n = timed_probe()
    files_n = len(spark.table(table).inputFiles())
    before = sorted(
        map(tuple, ivf_probe_index(spark, table, [0, 1, 2, 3, 4],
                                   k=10, nprobe=3).collect())
    )
    t0 = time.time()
    compact_ivf_index(spark, table)
    t_compact = time.time() - t0
    probe_c = timed_probe()
    files_c = len(spark.table(table).inputFiles())
    after = sorted(
        map(tuple, ivf_probe_index(spark, table, [0, 1, 2, 3, 4],
                                   k=10, nprobe=3).collect())
    )
    assert before == after, "probe result changed under compaction"
    print(
        f"rows/day={n:,} days={days} dim={dim}  write+train={t_write:.2f}s  "
        f"append(med)={statistics.median(t_app):.2f}s  "
        f"probe@1={probe_1:.2f}s  probe@{days}={probe_n:.2f}s  "
        f"compact={t_compact:.2f}s  probe@compacted={probe_c:.2f}s  "
        f"files {files_n} -> {files_c}  probe==pre-compact: OK"
    )
    for t in (table, f"{table}__centroids"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.stop()


if __name__ == "__main__":
    main()
