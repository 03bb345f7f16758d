#!/usr/bin/env python3
"""Round-over-round per-query bench comparison.

The driver's BENCH_r{N}.json keeps only the tail of bench.py's stdout,
which blinds comparison for most of the suite — so each round close
commits the FULL per-query ledger (bench_full_r{N}.json, written via
SPARK_GRAFT_BENCH_OUT).  This tool diffs two such ledgers (or a ledger
against a driver BENCH artifact — any JSON with a "queries" map works):

    python tools/bench_diff.py bench_full_r9.json bench_full_r10.json

Prints total delta, the biggest regressions and improvements by ratio
(absolute-time floor so 0.1 s -> 0.2 s noise doesn't lead the list),
and the queries present in only one ledger.  Single-run medians still
carry host variance — re-time a flagged query standalone (3 reps, see
SCALE.md round-9 notes on contaminated runs) before calling it a
regression.
"""
from __future__ import annotations

import argparse
import json


def load(path: str) -> dict[str, float]:
    with open(path) as fh:
        doc = json.load(fh)
    if isinstance(doc, dict) and "queries" in doc:
        return doc["queries"]
    if isinstance(doc, dict) and "tail" in doc:
        # driver BENCH_r{N}.json: {n, rc, cpus, sf, tail, parsed} where
        # tail is TRUNCATED stdout — salvage the per-query fragments it
        # kept ("name": seconds pairs; partial by design, which is why
        # the full committed ledger exists)
        import re

        got = {
            m.group(1): float(m.group(2))
            for m in re.finditer(r'"([a-z0-9_]+)": ([0-9.]+)', doc["tail"])
            if m.group(1) not in {
                "value", "sf", "repeat", "n_queries", "cold_only_n",
            }
        }
        print(f"note: {path} is a truncated driver artifact — "
              f"only {len(got)} per-query entries were recoverable")
        return got
    return doc


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--floor", type=float, default=0.5,
                    help="ignore ratio changes below this absolute "
                         "seconds delta (default 0.5)")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    shared = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))

    t_old = sum(old[q] for q in shared)
    t_new = sum(new[q] for q in shared)
    print(f"shared queries: {len(shared)}  "
          f"total {t_old:.1f}s -> {t_new:.1f}s "
          f"({t_new / t_old:.2f}x)" if t_old else "no shared queries")
    if only_new:
        t_add = sum(new[q] for q in only_new)
        print(f"added ({len(only_new)}, {t_add:.1f}s): {', '.join(only_new)}")
    if only_old:
        print(f"removed ({len(only_old)}): {', '.join(only_old)}")

    moved = [
        (new[q] / old[q], q, old[q], new[q])
        for q in shared
        if old[q] > 0 and abs(new[q] - old[q]) >= args.floor
    ]
    # sub-ms medians are recorded as 0.0 — a 0.0 -> 5.0s move has no
    # ratio but IS a regression; list it rather than reading as flat
    from_zero = sorted(
        (q for q in shared if old[q] == 0 and new[q] >= args.floor),
        key=lambda q: -new[q],
    )
    if from_zero:
        print("\ngrew from a 0.0s median (no ratio):")
        for q in from_zero:
            print(f"  {q:28s}    0.00s -> {new[q]:7.2f}s")
    regress = sorted((m for m in moved if m[0] > 1), reverse=True)[:args.top]
    improve = sorted(m for m in moved if m[0] < 1)[:args.top]
    if regress:
        print(f"\nslower (>= {args.floor}s delta):")
        for r, q, a, b in regress:
            print(f"  {q:28s} {a:7.2f}s -> {b:7.2f}s  ({r:.2f}x)")
    if improve:
        print(f"\nfaster (>= {args.floor}s delta):")
        for r, q, a, b in improve:
            print(f"  {q:28s} {a:7.2f}s -> {b:7.2f}s  ({r:.2f}x)")
    if not moved and not from_zero:
        print("no per-query move beyond the floor — flat round.")


if __name__ == "__main__":
    main()
