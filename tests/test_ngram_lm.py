"""Interpolated Kneser-Ney bigram LM (operators/ngram_lm.py)."""

import math

import pytest

from gdp_etl_spark.operators.ngram_lm import kn_bigram_score

from .conftest import spark  # noqa: F401

Q = 10**6
D = 0.75


def test_kn_bigram_hand_computed_branches(spark):
    """All four probability branches against hand-computed values:
    train corpus 'a b a c' + 'a b b' gives bigram counts (a,b):2,
    (b,a):1, (a,c):1, (b,b):1; N_bi=4; c(a)=3, c(b)=2; fan-out
    N1+(a,.)=2, N1+(b,.)=2; continuation N1+(.,b)=2, N1+(.,a)=1,
    N1+(.,c)=1."""
    train = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b b")], "doc_id bigint, text string"
    )
    score = spark.createDataFrame(
        [
            (10, "a b x"),   # seen bigram + (seen ctx, unseen cont)
            (11, "z a"),     # unseen context
            (12, "b a"),     # seen bigram
            (13, "q"),       # no bigrams
            (14, None),      # NULL text
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in kn_bigram_score(
        train, score, "text", "doc_id"
    ).collect()}

    pc_b, pc_a, pc_unk = 2 / 4, 1 / 4, 1 / 5
    p_ab = max(2 - D, 0.0) / 3 + (D * 2 / 3) * pc_b        # seen
    p_bx = (D * 2 / 2) * pc_unk                            # unseen cont
    p_za = pc_a                                            # unseen ctx
    p_ba = max(1 - D, 0.0) / 2 + (D * 2 / 2) * pc_a        # seen

    def q(p):
        return math.floor(math.log(p) * Q)

    assert out[10].n_bigrams == 2
    assert out[10].sum_logp_q == q(p_ab) + q(p_bx)
    assert out[10].avg_logp == pytest.approx(
        (q(p_ab) + q(p_bx)) / Q / 2
    )
    assert out[11].sum_logp_q == q(p_za)
    assert out[12].sum_logp_q == q(p_ba)
    assert out[13].n_bigrams == 0 and out[13].avg_logp is None
    assert out[14].n_bigrams == 0 and out[14].avg_logp is None

    # determinism across partitionings
    again = {r.doc_id: tuple(r) for r in kn_bigram_score(
        train.repartition(5), score.repartition(3), "text", "doc_id"
    ).collect()}
    assert again == {r.doc_id: tuple(r) for r in out.values()}

    with pytest.raises(ValueError, match="discount"):
        kn_bigram_score(train, score, discount=1.0)
    empty = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="no bigrams"):
        kn_bigram_score(empty, score)


def test_kn_bigram_self_perplexity_orders_quality(spark):
    """Self-scored natural repetition ranks above a doc made of
    bigrams the corpus never repeats — the filter signal the
    operator exists for."""
    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat " * 3) for i in range(5)]
        + [(99, "zq xv qk jw zz pq")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.avg_logp for r in kn_bigram_score(
        docs, docs, "text", "doc_id"
    ).collect()}
    assert all(out[i] > out[99] for i in range(5))


def test_kn_bigram_model_cache_releases_with_result(spark):
    """r13 verdict task 6: the persisted bigram model frame must not
    accrete for the session.  kn_bigram_score materializes it via
    eager localCheckpoint (the repo's barrier idiom) instead of a bare
    persist(), so once the caller drops the returned frame nothing
    holds the model RDD strongly and the ContextCleaner releases its
    blocks at its own pace.

    r15 deflake (verdict task 1): the old form asserted the
    getPersistentRDDs COUNT returned to baseline, which races the
    whole async release pipeline (Python GC -> py4j detach -> JVM GC
    -> ContextCleaner queue -> executor block removal) and flaked
    under full-suite load even at a 120 s settle.  The property under
    test is REACHABILITY, not cleaner latency: grab a JVM
    WeakReference to each model RDD our calls create, drop the
    results, and assert the referents are collected.  A real leak —
    the old bare persist(), or any strong reference retained past the
    result — keeps the referent alive through ANY number of full GCs,
    so this still fails deterministically on the regression while
    never waiting on executor round-trips."""
    import gc
    import time

    sc = spark.sparkContext

    def persistent_ids():
        ids = set()
        it = sc._jsc.getPersistentRDDs().keySet().iterator()
        while it.hasNext():
            ids.add(it.next())
        return ids

    def weak_refs_for(new_ids):
        """JVM WeakReferences to the scala RDD objects behind the given
        persistent-RDD ids.  Wrappers are dropped before returning so
        the py4j object map holds no strong path to the referents."""
        refs = []
        jmap = sc._jsc.getPersistentRDDs()
        for rid in new_ids:
            jrdd = jmap.get(rid)
            if jrdd is not None:
                refs.append(
                    spark._jvm.java.lang.ref.WeakReference(jrdd.rdd())
                )
            del jrdd
        del jmap
        return refs

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " * 2)
         for i in range(20)],
        "doc_id bigint, text string",
    )
    seen = persistent_ids()
    refs = []
    for _ in range(3):
        res = kn_bigram_score(docs, docs)
        res.collect()
        now = persistent_ids()
        refs.extend(weak_refs_for(now - seen))
        seen = now
        del res
    assert refs, "kn_bigram_score no longer materializes a model frame"
    # two-sided GC: python gc flushes py4j detach commands for the
    # dropped wrappers, then a JVM full GC clears weak references to
    # anything unreachable.  60 rounds is latency headroom only — a
    # strong reference (the leak under test) survives every round.
    deadline = time.time() + 60
    while time.time() < deadline:
        gc.collect()
        spark._jvm.System.gc()
        if all(r.get() is None for r in refs):
            break
        time.sleep(0.5)
    alive = [r.get() for r in refs if r.get() is not None]
    assert not alive, (
        f"{len(alive)}/{len(refs)} model RDDs still strongly reachable "
        f"after the results were dropped: {[str(a) for a in alive]}"
    )
