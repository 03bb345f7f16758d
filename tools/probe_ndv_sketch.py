#!/usr/bin/env python3
"""SCALE probe: the persisted NDV sketch table across an ingest cycle.

Simulates a growing corpus: N daily increments of ROWS each append
their registers to one stamped sketch table.  Measures (warm medians
of 3) the merge-on-read estimate latency after 1 vs N appends, the
row/file growth, and the effect of compaction — and verifies the
final estimates are bit-identical to sketching the full union
directly (the associativity contract at probe scale).

Run: python tools/probe_ndv_sketch.py [--appends 10] [--rows 2000000]
"""
from __future__ import annotations

import argparse
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--appends", type=int, default=10)
    ap.add_argument("--rows", type=int, default=2_000_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gdp_etl_spark.operators.sketches import (
        append_to_ndv_sketch,
        compact_ndv_sketch,
        ndv_from_sketch,
        portable_hll_ndv,
        write_ndv_sketch,
    )
    from gdp_etl_spark.session import get_spark

    spark = get_spark("probe_ndv_sketch", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    n, days = args.rows, args.appends
    table = "probe_ndv_tbl"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/{table}", ignore_errors=True)

    def day(i: int):
        # day i contributes ids [i*n, (i+1)*n); values overlap across
        # days (val space = total/3) so appends genuinely merge
        return spark.range(i * n, (i + 1) * n).select(
            F.concat(F.lit("src"), (F.col("id") % 5).cast("string"))
            .alias("grp"),
            (F.col("id") % (days * n // 3)).alias("val"),
        )

    def timed_read():
        ts = []
        for _ in range(4):
            t0 = time.time()
            ndv_from_sketch(spark, table).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.time() - t0)
        return statistics.median(ts[1:])

    t0 = time.time()
    write_ndv_sketch(day(0), ["grp"], "val", table)
    t_write = time.time() - t0
    read_1 = timed_read()
    t_app = []
    for i in range(1, days):
        t0 = time.time()
        append_to_ndv_sketch(day(i), table)
        t_app.append(time.time() - t0)
    read_n = timed_read()
    rows_n = spark.table(table).count()
    t0 = time.time()
    compact_ndv_sketch(spark, table)
    t_compact = time.time() - t0
    read_c = timed_read()
    rows_c = spark.table(table).count()

    # correctness: stored-state estimates == direct sketch of the union
    union = day(0)
    for i in range(1, days):
        union = union.unionByName(day(i))
    direct = {
        r["grp"]: tuple(r)[1:] for r in
        portable_hll_ndv(union, ["grp"], "val", p=8).collect()
    }
    stored = {
        r["grp"]: tuple(r)[1:] for r in
        ndv_from_sketch(spark, table).collect()
    }
    assert stored == direct, "stored-state estimates diverged from direct"
    print(
        f"rows/day={n:,} days={days}  write={t_write:.2f}s  "
        f"append(med)={statistics.median(t_app):.2f}s  "
        f"read@1={read_1:.2f}s  read@{days}={read_n:.2f}s  "
        f"compact={t_compact:.2f}s  read@compacted={read_c:.2f}s  "
        f"state_rows {rows_n:,} -> {rows_c:,}  estimates==direct: OK"
    )
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.stop()


if __name__ == "__main__":
    main()
