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
    persist(), so once the caller drops the returned frame the
    ContextCleaner releases the blocks — repeated scoring in one
    session returns getPersistentRDDs to its baseline instead of
    pinning one vocabulary-scale cache per call."""
    import gc
    import time

    sc = spark.sparkContext

    def n_persistent():
        return sc._jsc.sc().getPersistentRDDs().size()

    def settle(target, seconds):
        """Drive GC both sides until the persistent-RDD count reaches
        ``target`` or ``seconds`` elapse — the ContextCleaner releases
        asynchronously, and under a full-suite session its queue can
        lag (this test flaked order-dependently with a fixed 45 s)."""
        n = n_persistent()
        for _ in range(seconds):
            if n <= target:
                return n
            gc.collect()
            spark._jvm.System.gc()
            time.sleep(1)
            n = n_persistent()
        return n

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " * 2)
         for i in range(20)],
        "doc_id bigint, text string",
    )
    # flush earlier tests' pending releases so the baseline is settled
    settle(0, 20)
    baseline = n_persistent()
    for _ in range(3):
        res = kn_bigram_score(docs, docs)
        res.collect()
        del res
    # each call checkpoints one model frame; they are only reachable
    # through the dropped results, so GC must return us to (about) the
    # baseline.  Allow ONE pending straggler: the property under test
    # is no accretion PER CALL (3 calls => +3 under the old persist()
    # leak), not cleaner-queue synchrony.
    final = settle(baseline + 1, 120)
    assert final <= baseline + 1, (final, baseline)
