#!/usr/bin/env python3
"""SCALE probe: SemDeDup's cluster-scoped candidate space.

Claim (dedup.semantic_dedup / SCALE.md): with ``num_cells ∝ n`` the
expected cell size — and therefore the per-row pair work — stays
constant, so wall-clock grows ~linearly in the corpus while an
all-pairs scan would grow quadratically.  The probe measures warm
medians at n and 10n with cells scaled 10×, plus the counterfactual
(10n with the SMALL cell count — the quadratic trap) so the number the
claim rests on is printed, not assumed.

Run: python tools/probe_semantic_dedup.py [--rows 20000] [--dim 16]
"""
from __future__ import annotations

import argparse
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=5_000)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--trap", action="store_true",
                    help="also run the 10n-with-small-cell-count "
                         "counterfactual (NOT survivable at the default "
                         "sizes: killed at 28 min in the round-13 probe "
                         "while the scaled-cells run took seconds - "
                         "k-means skew concentrates the pair work in one "
                         "cell on top of the quadratic blowup)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gdp_etl_spark.operators.dedup import semantic_dedup
    from gdp_etl_spark.session import get_spark

    spark = get_spark("probe_semdedup", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    n, dim = args.rows, args.dim

    def vecs(rows: int):
        # deterministic synthetic vectors in [-1, 1)
        return spark.range(rows).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda j: (
                    (F.pmod(F.col("id") * 37 + j * 13, 997) / 498.5 - 1.0)
                ).cast("float"),
            ).alias("embedding"),
        ).localCheckpoint()

    def timed(df, cells, samples=3):
        ts = []
        for _ in range(samples):
            t0 = time.time()
            semantic_dedup(
                df, "vec_id", "embedding", threshold=0.9,
                num_cells=cells, n_iter=2,
            ).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        return statistics.median(ts[1:]) if samples > 1 else ts[0]

    small, big = vecs(n), vecs(10 * n)
    k = max(8, n // 1000)
    t_small = timed(small, k)
    t_big_scaled = timed(big, 10 * k)
    print(
        f"n={n:,} dim={dim}  cells∝n: {t_small:.2f}s @ {k} cells → "
        f"{t_big_scaled:.2f}s @ {10 * k} cells on 10n "
        f"({t_big_scaled / t_small:.1f}× for 10× data)"
    )
    if args.trap:
        # ONE sample: the trap exists to be demonstrated, not survived
        t_big_trap = timed(big, k, samples=1)
        print(
            f"counterfactual 10n @ {k} cells (quadratic trap): "
            f"{t_big_trap:.2f}s ({t_big_trap / t_big_scaled:.1f}× the "
            f"scaled-cells run)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
