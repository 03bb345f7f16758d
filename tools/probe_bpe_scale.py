#!/usr/bin/env python3
"""Probe: BPE training cost vs corpus size (operators/bpe.py).

Claim under test (the 100-TB story): the ONLY corpus-scale stage is
the word-frequency aggregate; the merge rounds run on the
vocabulary-bounded frequency table, so growing the corpus 10× grows
only the count stage, not the per-round cost.

Method: documents at sf0.1, then the same corpus replicated 10× (ids
offset so rows are distinct).  Time (a) bpe_word_freq materialization
and (b) train_bpe_merges with the distributed loop forced
(driver_threshold=0 — the fast path would hide the claim).  The vocab
(and therefore the merge table) is identical in both runs, which the
probe asserts.

Run on a quiet host: python tools/probe_bpe_scale.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from gdp_etl_spark.operators.bpe import (  # noqa: E402
    bpe_word_freq,
    train_bpe_merges,
)
from gdp_etl_spark.session import get_spark  # noqa: E402


def run(docs, label, num_merges=10):
    t0 = time.time()
    # min_count=1: replication must scale every count uniformly; a
    # threshold would ADMIT former singletons (cnt 1 -> 10) into the
    # replicated vocab and change the merge choices (review finding)
    words = bpe_word_freq(docs, "text", min_count=1).localCheckpoint()
    n_vocab = words.count()
    t_freq = time.time() - t0
    t1 = time.time()
    merges = [
        tuple(r)
        for r in train_bpe_merges(words, num_merges, driver_threshold=0)
        .orderBy("rank")
        .collect()
    ]
    t_train = time.time() - t1
    print(
        f"{label}: n_docs={docs.count()} vocab={n_vocab} "
        f"freq={t_freq:.2f}s train({num_merges} rounds)={t_train:.2f}s "
        f"per-round={t_train / num_merges:.2f}s"
    )
    return merges


def main():
    spark = get_spark("bpe-probe", master="local[32]", shuffle_partitions=32)
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    m1 = run(docs, "sf0.1      ")
    big = docs
    for i in range(1, 10):
        big = big.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        )
    big = big.localCheckpoint()
    m10 = run(big, "sf0.1 x 10 ")
    # replication multiplies every pair_count by exactly 10 but must
    # not change WHICH merges are learned (ties scale uniformly)
    assert [m[:4] for m in m1] == [m[:4] for m in m10], (
        "replication changed the learned merges!"
    )
    assert all(b[4] == 10 * a[4] for a, b in zip(m1, m10)), (
        "pair counts did not scale 10x!"
    )
    print("merges identical, counts scaled exactly 10x: OK")


if __name__ == "__main__":
    main()
