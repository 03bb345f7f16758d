#!/usr/bin/env python3
"""SCALE probe: IVF index maintenance under CHURN (r14).

Simulates a re-crawl cycle on a large vector store: day 0 trains and
writes the index, then N churn batches each UPSERT ``rows_up`` vectors
(new versions, cells can move) and DELETE ``rows_del`` ids — all via
tombstones, never rewriting the posting table.  Measures:

* upsert/delete cost per batch — must track the BATCH, not the store
  (the posting table is never scanned by a mutation);
* probe latency as tombstones accumulate — the read-time liveness
  broadcast is the price of not rewriting; it should grow with the
  TOMBSTONE count (kilobytes/batch), not the corpus;
* compaction cost and the post-compaction probe — back to the clean
  figure, tombstone table gone;
* correctness: the probe result is invariant under compaction, no
  deleted id is ever served, and the final live row count equals the
  logical corpus size.

Run: python tools/probe_index_churn.py [--rows 200000] [--batches 10]
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
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--rows-up", type=int, default=20_000)
    ap.add_argument("--rows-del", type=int, default=5_000)
    ap.add_argument("--dim", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gdp_etl_spark.operators.ann_index import (
        compact_ivf_index,
        delete_from_ivf_index,
        ivf_probe_index,
        upsert_to_ivf_index,
        write_ivf_index,
    )
    from gdp_etl_spark.session import get_spark

    spark = get_spark("probe_index_churn", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    n, dim = args.rows, args.dim
    table = "probe_churn_tbl"
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in (table, f"{table}__centroids", f"{table}__vectors",
              f"{table}__tombstones"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)

    def vecs(lo: int, hi: int, salt: int = 0):
        # deterministic synthetic vectors in [-1, 1); salt varies the
        # "re-crawled" content so an upsert is a real new version
        return spark.range(lo, hi).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda j: (
                    (F.pmod(F.col("id") * 31 + j * 17 + salt * 101, 1000)
                     / 500.0 - 1.0)
                ).cast("float"),
            ).alias("embedding"),
        )

    qids = [n - 1 - i for i in range(5)]  # never churned ids

    def timed_probe():
        ts = []
        for _ in range(4):
            t0 = time.time()
            ivf_probe_index(
                spark, table, qids, k=10, nprobe=3
            ).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        return statistics.median(ts[1:])

    t0 = time.time()
    write_ivf_index(vecs(0, n), table, num_centroids=16, n_iter=2)
    print(f"write+train({n:,} rows): {time.time() - t0:.2f}s")
    probe_clean = timed_probe()

    t_up, t_del = [], []
    deleted: set[int] = set()
    for b in range(args.batches):
        # upserts cycle over the LOWER half, deletes walk down from the
        # top — disjoint, so the live count is exactly n - |deleted|
        # (a delete-then-later-upsert would legitimately resurrect the
        # id: tombstones are per-seq, not forever)
        lo = (b * args.rows_up) % (n // 2)
        t0 = time.time()
        upsert_to_ivf_index(vecs(lo, lo + args.rows_up, salt=b + 1), table)
        t_up.append(time.time() - t0)
        dlo = n - (b + 1) * args.rows_del - 10  # keep qids alive
        dels = list(range(dlo, dlo + args.rows_del))
        assert dlo >= n // 2 + args.rows_up, "ranges must stay disjoint"
        deleted.update(dels)
        t0 = time.time()
        delete_from_ivf_index(spark, table, dels)
        t_del.append(time.time() - t0)
        if b in (0, args.batches // 2, args.batches - 1):
            print(f"  batch {b}: upsert={t_up[-1]:.2f}s "
                  f"delete={t_del[-1]:.2f}s probe={timed_probe():.2f}s")
    probe_churned = timed_probe()
    got = ivf_probe_index(spark, table, qids, k=20, nprobe=4).collect()
    assert not any(r["neighbour_id"] in deleted for r in got), \
        "probe served a deleted id"
    before = sorted(map(tuple, got))
    files_n = len(spark.table(table).inputFiles())
    t0 = time.time()
    compact_ivf_index(spark, table)
    t_compact = time.time() - t0
    files_c = len(spark.table(table).inputFiles())
    probe_c = timed_probe()
    after = sorted(map(tuple, ivf_probe_index(
        spark, table, qids, k=20, nprobe=4).collect()))
    assert before == after, "probe result changed under compaction"
    live = spark.table(table).count()
    assert live == n - len(deleted), (live, n - len(deleted))
    print(
        f"rows={n:,} batches={args.batches} "
        f"upsert/batch={args.rows_up:,} delete/batch={args.rows_del:,}\n"
        f"upsert(med)={statistics.median(t_up):.2f}s "
        f"first={t_up[0]:.2f}s last={t_up[-1]:.2f}s  "
        f"delete(med)={statistics.median(t_del):.2f}s\n"
        f"probe clean={probe_clean:.2f}s  churned={probe_churned:.2f}s  "
        f"compacted={probe_c:.2f}s  compact={t_compact:.2f}s  "
        f"files {files_n} -> {files_c}\n"
        f"live rows={live:,} (= logical corpus)  "
        f"deleted-never-served: OK  compaction-invariant: OK"
    )
    for t in (table, f"{table}__centroids", f"{table}__vectors",
              f"{table}__tombstones"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.stop()


if __name__ == "__main__":
    main()
