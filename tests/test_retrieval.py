"""Ranked retrieval (BM25, inverted index) and PII redaction."""

import math

import pytest
from pyspark.sql import functions as F

from gdp_etl_spark.functions.text import pii_counts, redact_pii
from gdp_etl_spark.operators.retrieval import (
    bm25_topk,
    corpus_stats,
    doc_term_freq,
    inverted_index,
)

from .conftest import rows


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark spark spark fast"),
            (2, "spark join"),
            (3, "slow table scan join join join"),
            (4, "unrelated words only here"),
            (5, ""),
            (6, None),
        ],
        "doc_id long, text string",
    )


def test_doc_term_freq_filters_before_agg(corpus):
    tf = doc_term_freq(corpus, terms=["spark", "join"])
    got = {(r["doc_id"], r["term"]): (r["tf"], r["dl"]) for r in tf.collect()}
    assert got[(1, "spark")] == (3, 4)
    assert got[(2, "spark")] == (1, 2) and got[(2, "join")] == (1, 2)
    assert got[(3, "join")] == (3, 6)
    assert (4, "spark") not in got and not any(d in (5, 6) for d, _ in got)


def test_corpus_stats_counts_empty_docs(corpus):
    r = corpus_stats(corpus).collect()[0]
    # empty/NULL docs count as length-0 documents, not as absent ones
    assert r["n_docs"] == 6
    assert r["avgdl"] == pytest.approx((4 + 2 + 6 + 4 + 0 + 0) / 6)


def test_bm25_ranking_matches_hand_formula(corpus):
    out = [(r["doc_id"], r["score"]) for r in bm25_topk(corpus, ["spark", "join"], k=10).collect()]
    got = dict(out)
    # doc 4/5/6 match no term
    assert set(got) == {1, 2, 3}

    def idf(df, n=6):
        return math.log((n - df + 0.5) / (df + 0.5) + 1.0)

    def part(tf, dl, avgdl=16 / 6, k1=1.5, b=0.75):
        return tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dl / avgdl))

    exp1 = idf(2) * part(3, 4)  # 'spark' df=2
    assert got[1] == pytest.approx(exp1, rel=1e-9)
    exp2 = idf(2) * part(1, 2) + idf(2) * part(1, 2)  # both terms, df=2 each
    assert got[2] == pytest.approx(exp2, rel=1e-9)
    # ranking: doc2 (two matched terms, tiny doc) above doc1 above doc3
    assert [d for d, _ in out] == sorted(got, key=lambda d: (-got[d], d))


def test_inverted_index_sorted_distinct_postings(corpus):
    idx = {r["term"]: r for r in inverted_index(corpus).collect()}
    assert idx["spark"]["postings"] == [1, 2]  # repeated in doc1 -> once
    assert idx["spark"]["df"] == 2
    assert idx["join"]["postings"] == [2, 3]
    assert "" not in idx


def test_redact_pii_order_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "see https://x.io/p/123456789 or mail a.b@x.io, call +1 555-123-4567"),
            (2, "no pii at all"),
            (3, None),
        ],
        "id long, t string",
    )
    c = pii_counts(F.col("t"))
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            redact_pii(F.col("t")).alias("red"),
            *[v.alias(k) for k, v in c.items()],
        ).collect()
    }
    # URL pass runs first, so its digit run is never phone-tagged
    assert got[1]["red"] == "see <URL> or mail <EMAIL>, call <PHONE>"
    assert (got[1]["url"], got[1]["email"], got[1]["phone"]) == (1, 1, 1)
    assert got[2]["red"] == "no pii at all"
    assert got[3]["red"] is None and got[3]["phone"] == 0


def test_clean_corpus_stages(spark):
    from gdp_etl_spark.plans.corpus import clean_corpus

    docs = spark.createDataFrame(
        [
            # two docs identical after redaction -> lowest id survives
            (1, "the data table is fast and the scan is slow mail x@y.io ok"),
            (2, "the data table is fast and the scan is slow mail z@q.io ok"),
            # different doc, same language
            (3, "a join of the batch and the stream is in the plan today ok"),
            # non-english -> filtered
            (4, "el la los las es un una que si no mas por para con sin"),
            (5, None),  # NULL -> quality 0 -> filtered
        ],
        "doc_id long, text string",
    )
    out = clean_corpus(docs, min_quality=0.1, langs=("en",), sample_fraction=None)
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {1, 3}
    assert "<EMAIL>" in got[1]["text_clean"] and "x@y.io" not in got[1]["text_clean"]
    # sampling composes: the 30% sample is a subset of the 100% result
    sampled = clean_corpus(docs, min_quality=0.1, langs=("en",), sample_fraction=0.3)
    assert {r["doc_id"] for r in sampled.collect()} <= set(got)


def test_clean_corpus_null_text_not_silently_dropped(spark):
    """With langs=None a NULL-text doc passes the default gates
    (quality_score(NULL) = 0.6 via the when/otherwise fallbacks, lang
    'und'); md5(NULL) is NULL so the bare-key dedup join used to drop
    every such row silently.  Contract: NULL texts form ONE duplicate
    group and the lowest-id copy survives."""
    from gdp_etl_spark.plans.corpus import clean_corpus

    docs = spark.createDataFrame(
        [
            (1, "the data table is fast and the scan is slow and it is ok"),
            (7, None),
            (5, None),
            (9, None),
        ],
        "doc_id long, text string",
    )
    out = clean_corpus(docs, min_quality=0.1, langs=None, sample_fraction=None)
    got = {r["doc_id"]: r for r in out.collect()}
    # doc 1 survives on its own text; the three NULL texts dedup to the
    # lowest id (5) — none vanish, none duplicate
    assert set(got) == {1, 5}
    assert got[5]["text_clean"] is None


def test_rrf_fuse_semantics(spark):
    """RRF: items on both lists outrank single-list items; integer
    fixed-point contributions are exact (scale div (k0 + rank))."""
    from gdp_etl_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id bigint, rank int"
    )
    sem = spark.createDataFrame(
        [(3, 1), (4, 2), (1, 3)], "doc_id bigint, rank int"
    )
    out = rrf_fuse([lex, sem], "doc_id", k0=60, k=10).collect()
    got = [(r.doc_id, r.rrf_score, r.n_lists, r.best_rank) for r in out]
    S = 1_000_000_000_000
    want = {
        1: (S // 61 + S // 63, 2, 1),
        2: (S // 62, 1, 2),
        3: (S // 63 + S // 61, 2, 1),
        4: (S // 62, 1, 2),
    }
    assert {g[0]: (g[1], g[2], g[3]) for g in got} == want
    # both-list docs (1, 3) lead; ties break on doc_id ascending
    assert [g[0] for g in got] == [1, 3, 2, 4]


def test_rrf_fuse_validation(spark):
    from gdp_etl_spark.operators.retrieval import rrf_fuse

    df = spark.createDataFrame([(1, 1)], "doc_id bigint, rank int")
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([], "doc_id")
    with pytest.raises(ValueError, match="k0"):
        rrf_fuse([df], "doc_id", k0=0)
    norank = spark.createDataFrame([(1,)], "doc_id bigint")
    with pytest.raises(ValueError, match="rank"):
        rrf_fuse([df, norank], "doc_id")


def test_rrf_fuse_bad_ranks_raise(spark):
    """NULL / zero / negative ranks must raise loudly, not silently
    skip the list's contribution (review finding)."""
    from pyspark.errors import SparkRuntimeException

    from gdp_etl_spark.operators.retrieval import rrf_fuse

    ok = spark.createDataFrame([(1, 1)], "doc_id bigint, rank int")
    for bad_rank in (None, 0, -60):
        bad = spark.createDataFrame(
            [(2, bad_rank)], "doc_id bigint, rank int"
        )
        with pytest.raises(SparkRuntimeException, match="rank"):
            rrf_fuse([ok, bad], "doc_id").collect()


def test_rrf_fuse_duplicate_id_within_list_raises(spark):
    """A duplicate id WITHIN one ranking list double-counts its
    reciprocal-rank mass and inflates n_lists past len(rankings) —
    must raise, not corrupt scores (review finding, r13).  The same id
    on DIFFERENT lists stays legal (that is the whole point of RRF)."""
    from pyspark.errors import SparkRuntimeException

    from gdp_etl_spark.operators.retrieval import rrf_fuse

    dup = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 3)], "doc_id bigint, rank int"
    )
    with pytest.raises(SparkRuntimeException, match="more than once"):
        rrf_fuse([dup], "doc_id").collect()
    # cross-list repetition still fuses fine
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id bigint, rank int")
    b = spark.createDataFrame([(1, 2), (3, 1)], "doc_id bigint, rank int")
    out = {r.doc_id: r.n_lists for r in rrf_fuse([a, b], "doc_id").collect()}
    assert out == {1: 2, 2: 1, 3: 1}
