#!/usr/bin/env python3
"""SCALE probe: MinHash-index probe latency across an ingest cycle.

Question (round-8 verdict task 6): `run_near_dup_ingest` folds every
micro-batch into the band + sets tables via `append_to_minhash_index`
— each append adds up to n_buckets files to BOTH tables, so does the
per-batch near-dup screen (`near_dup_against_index`) slow down as
batches accumulate, and does `compact_minhash_index` restore it?

Method: build the index from the sf0.1 corpus quarter (%4==0), then
append N daily batches (disjoint %40 slices, ~146 docs each), timing a
WARM fixed 500-doc probe (median of 3) at 1 append, N appends, and
after compaction.  The md5-index has this evidence since round 8; this
closes the MinHash half.

Run: python tools/probe_minhash_ingest.py [--batches 10]
"""
from __future__ import annotations

import argparse
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def file_count(wh: str, table: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(os.path.join(wh, table)):
        n += sum(1 for f in files if not f.startswith(("_", ".")))
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gdp_etl_spark.operators.dedup import (
        append_to_minhash_index,
        compact_minhash_index,
        near_dup_against_index,
        write_minhash_index,
    )
    from gdp_etl_spark.session import get_spark

    spark = get_spark("probe-minhash", master="local[32]", shuffle_partitions=32)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    table = "probe_minhash_idx"
    for t in (table, f"{table}_sets"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)

    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.pmod("doc_id", F.lit(4)) == 0)
    probe_batch = (
        docs.filter(F.pmod("doc_id", F.lit(4)) == 2)
        .limit(500)
        .localCheckpoint(eager=True)
    )

    def timed_probe() -> float:
        ts = []
        for _ in range(3):
            t0 = time.time()
            near_dup_against_index(
                spark, probe_batch, "text", "doc_id", table,
                num_perm=16, bands=8, jaccard_threshold=0.8,
            ).count()
            ts.append(time.time() - t0)
        return statistics.median(ts)

    write_minhash_index(corpus, "text", "doc_id", table, num_perm=16, bands=8)
    print(f"index built: rows={spark.table(table).count()}, "
          f"files band={file_count(wh, table)} sets={file_count(wh, table + '_sets')}")

    results = {}
    for i in range(args.batches):
        batch = docs.filter(
            (F.pmod("doc_id", F.lit(4)) == 1)
            & (F.pmod("doc_id", F.lit(4 * args.batches)) == 4 * i + 1)
        )
        append_to_minhash_index(batch, "text", "doc_id", table,
                                num_perm=16, bands=8)
        if i == 0:
            results["after 1 append"] = (
                timed_probe(), file_count(wh, table),
                file_count(wh, f"{table}_sets"),
            )
    results[f"after {args.batches} appends"] = (
        timed_probe(), file_count(wh, table), file_count(wh, f"{table}_sets"),
    )
    t0 = time.time()
    counts = compact_minhash_index(spark, table)
    compact_sec = time.time() - t0
    results["after compaction"] = (
        timed_probe(), file_count(wh, table), file_count(wh, f"{table}_sets"),
    )

    print(f"\ncompaction: {compact_sec:.1f}s one-off, files {counts}")
    print(f"{'state':24s} {'warm probe (median of 3)':>26s} {'band files':>11s} {'sets files':>11s}")
    for k, (sec, fb, fs) in results.items():
        print(f"{k:24s} {sec:>25.2f}s {fb:>11d} {fs:>11d}")

    for t in (table, f"{table}_sets"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)


if __name__ == "__main__":
    main()
