"""Tests for the corpus-pipeline operators added late in round 2:
decontamination, repetition metrics, sequence packing, embedding
transforms, heavy hitters, and IQR fences."""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

def test_decontaminate_flags_overlapping_docs(spark):
    from gdp_etl_spark.operators.decontam import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different words nothing shared here at all folks"),
            (3, None),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over the lazy dog")],
        "doc_id bigint, text string",
    )
    out = rows(
        decontaminate(docs, bench, "text", "doc_id", shingle_k=8),
        "doc_id", "n_overlap", "is_contaminated",
    )
    flags = {r[0]: (r[1], r[2]) for r in out}
    assert flags[1][0] >= 1 and flags[1][1] is True
    assert flags[2] == (0, False)
    assert flags[3] == (0, False)  # NULL text → no shingles → clean


def test_decontaminate_min_overlap_threshold(spark):
    from gdp_etl_spark.operators.decontam import decontaminate

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h x")], "doc_id bigint, text string"
    )
    bench = spark.createDataFrame(
        [(9, "a b c d e f g h")], "doc_id bigint, text string"
    )
    # doc has shingles "a..h" and "b..x": exactly one overlaps
    out = decontaminate(docs, bench, "text", "doc_id", shingle_k=8,
                        min_overlap=2)
    assert rows(out, "n_overlap", "is_contaminated") == [(1, False)]


def test_semantic_decontaminate_flags_near_identical_vectors(spark):
    from gdp_etl_spark.operators.decontam import semantic_decontaminate

    bench_vec = [0.5, -0.3, 0.8, 0.1]
    near = [x + 0.001 for x in bench_vec]      # cosine ~ 1
    far = [-x for x in bench_vec]              # cosine = -1
    docs = spark.createDataFrame(
        [(10, near), (11, far)], "vec_id bigint, embedding array<float>"
    )
    bench = spark.createDataFrame(
        [(1, bench_vec)], "vec_id bigint, embedding array<float>"
    )
    out = semantic_decontaminate(
        docs, bench, "embedding", "vec_id", threshold=0.95, dim=4
    )
    got = rows(out, "vec_id", "n_hits")
    assert got == [(10, 1)]                    # near flagged, far clean
    # deterministic across partitionings
    out2 = semantic_decontaminate(
        docs.repartition(3), bench, "embedding", "vec_id",
        threshold=0.95, dim=4,
    )
    assert rows(out) == rows(out2)


# ---------------------------------------------------------------------------
# repetition metrics
# ---------------------------------------------------------------------------

def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).first()["v"]


def test_dup_ngram_ratio(spark):
    from gdp_etl_spark.functions.text import dup_ngram_ratio

    # "a a a a": bigrams [a a, a a, a a] → 1 distinct of 3 → ratio 2/3
    v = _one(spark, "a a a a", dup_ngram_ratio(F.col("text"), 2))
    assert v == pytest.approx(2.0 / 3.0)
    assert _one(spark, "a b c d", dup_ngram_ratio(F.col("text"), 2)) == 0.0
    assert _one(spark, None, dup_ngram_ratio(F.col("text"), 2)) == 0.0
    assert _one(spark, "   ", dup_ngram_ratio(F.col("text"), 3)) == 0.0


def test_top_token_dominance(spark):
    from gdp_etl_spark.functions.text import top_token_dominance

    assert _one(spark, "a b a", top_token_dominance(F.col("text"))) == (
        pytest.approx(2.0 / 3.0)
    )
    assert _one(spark, "x x x", top_token_dominance(F.col("text"))) == 1.0
    assert _one(spark, None, top_token_dominance(F.col("text"))) == 0.0


def test_collapse_repeated_tokens(spark):
    from gdp_etl_spark.functions.text import collapse_repeated_tokens

    c = collapse_repeated_tokens(F.col("text"))
    assert _one(spark, "x x y y y z", c) == "x y z"
    assert _one(spark, "a b a", c) == "a b a"  # only IMMEDIATE repeats
    assert _one(spark, None, c) is None


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def test_pack_sequences_chunking(spark):
    from gdp_etl_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, "en", 4), (2, "en", 4), (3, "en", 4), (4, "en", 4),
         (5, "de", 11)],
        "doc_id bigint, lang string, n_tok int",
    )
    out = rows(
        pack_sequences(df, "n_tok", 10, ["lang"], ["doc_id"]),
        "doc_id", "seq_id", "seq_offset",
    )
    # en stream starts: 0,4,8,12 → seqs 0,0,0,1; de shard independent
    assert out == [(1, 0, 0), (2, 0, 4), (3, 0, 8), (4, 1, 2), (5, 0, 0)]


def test_pack_sequences_requires_order(spark):
    from gdp_etl_spark.operators.packing import pack_sequences

    df = spark.createDataFrame([(1, 1)], "doc_id bigint, n_tok int")
    with pytest.raises(ValueError):
        pack_sequences(df, "n_tok", 10, [], [])


# ---------------------------------------------------------------------------
# embedding transforms
# ---------------------------------------------------------------------------

def test_l2_normalize_and_quantize(spark):
    from gdp_etl_spark.functions.vectors import l2_normalize, quantize_int8

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    out = {
        r["vec_id"]: (r["unit"], r["q8"])
        for r in df.select(
            "vec_id",
            l2_normalize(F.col("embedding")).alias("unit"),
            quantize_int8(F.col("embedding")).alias("q8"),
        ).collect()
    }
    unit, q8 = out[1]
    assert unit[0] == pytest.approx(0.6) and unit[1] == pytest.approx(0.8)
    assert math.isclose(sum(x * x for x in unit), 1.0, rel_tol=1e-9)
    assert q8 == [95, 127]  # floor(3*127/4 + .5)=95, max → 127
    assert out[2] == (None, None)  # zero vector → NULL, not div-by-zero


def test_random_projection_deterministic(spark):
    from gdp_etl_spark.functions.vectors import random_projection

    df = spark.createDataFrame(
        [(1, [0.5] * 8)], "vec_id bigint, embedding array<float>"
    )
    a = df.select(random_projection(F.col("embedding"), 4).alias("p")).first()["p"]
    b = df.select(random_projection(F.col("embedding"), 4).alias("p")).first()["p"]
    assert len(a) == 4 and a == b  # same seed → identical output
    c = df.select(
        random_projection(F.col("embedding"), 4, seed="other").alias("p")
    ).first()["p"]
    assert a != c  # seed changes the sign matrix


# ---------------------------------------------------------------------------
# heavy hitters / IQR fences
# ---------------------------------------------------------------------------

def test_heavy_hitters_threshold(spark):
    from gdp_etl_spark.operators.outliers import heavy_hitters

    df = spark.createDataFrame(
        [("a",)] * 60 + [("b",)] * 39 + [("c",)], "item string"
    )
    out = rows(heavy_hitters(df, F.col("item"), min_share=0.02),
               "item", "cnt")
    assert out == [("a", 60), ("b", 39)]  # c = 1% < 2% support


def test_iqr_fences_counts(spark):
    from gdp_etl_spark.operators.outliers import iqr_fences

    vals = [float(v) for v in range(1, 13)] + [1000.0, -1000.0]
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v double")
    r = iqr_fences(df, "v", ["grp"]).first()
    assert r["n_total"] == 14
    assert r["n_above"] == 1 and r["n_below"] == 1
    assert r["lo"] < 1.0 and r["hi"] > 12.0


# ---------------------------------------------------------------------------
# weighted sampling / profiling
# ---------------------------------------------------------------------------

def test_weighted_sample_deterministic_and_weighted(spark):
    from gdp_etl_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, 1) for i in range(100)] + [(1000, 100000), (1001, 0)],
        "doc_id bigint, w int",
    )
    a = rows(weighted_sample(df, "doc_id", "w", k=10), "doc_id")
    b = rows(weighted_sample(df, "doc_id", "w", k=10), "doc_id")
    assert a == b and len(a) == 10          # deterministic draw
    assert (1000,) in a                      # w=100000 dominates k=10 draw
    assert (1001,) not in a                  # zero weight never sampled
    # composability with a different seed changes the sample
    c = rows(weighted_sample(df, "doc_id", "w", k=10, seed="s2"), "doc_id")
    assert (1000,) in c and a != c


def test_profile_columns_counts(spark):
    from gdp_etl_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        "k bigint, v string",
    )
    out = {r["column"]: r for r in profile_columns(df).collect()}
    assert out["k"]["n_rows"] == 4 and out["k"]["n_nulls"] == 1
    assert out["k"]["n_distinct"] == 3
    assert out["v"]["n_nulls"] == 1 and out["v"]["n_distinct"] == 2
    assert out["v"]["null_frac"] == 0.25


def test_pseudonymize_stable_salted_null_safe(spark):
    from gdp_etl_spark.functions.text import pseudonymize

    df = spark.createDataFrame([(1,), (1,), (2,), (None,)], "k bigint")
    out = [
        r["p"]
        for r in df.select(pseudonymize(F.col("k"), "s").alias("p")).collect()
    ]
    assert out[0] == out[1] and len(out[0]) == 64  # stable, sha-256 hex
    assert out[2] != out[0]
    assert out[3] is None
    other = df.select(pseudonymize(F.col("k"), "t").alias("p")).first()["p"]
    assert other != out[0]  # salt changes the mapping


# ---------------------------------------------------------------------------
# composed curation DAG
# ---------------------------------------------------------------------------

def test_curate_corpus_invariants(spark):
    from gdp_etl_spark.plans.corpus import curate_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    out = curate_corpus(docs, bench).cache()
    a = rows(out)
    assert a == rows(curate_corpus(docs, bench))  # deterministic end to end
    assert 0 < len(a) <= docs.count()
    # benchmark members decontaminate themselves away
    got_ids = {r[0] for r in a}
    assert not got_ids & {r[0] for r in bench.select("doc_id").collect()}
    # survivors have unique texts (exact + near-dup stages both applied)
    texts = docs.filter(F.col("doc_id").isin(list(got_ids))).select("text")
    assert texts.distinct().count() == len(a)
    # packing offsets stay inside the budget and splits are exhaustive
    assert all(0 <= r[5] < 128 for r in a)
    assert {r[2] for r in a} <= {"train", "val", "test"}


def test_length_bucketed_batches(spark):
    from gdp_etl_spark.operators.packing import length_bucketed_batches

    df = spark.createDataFrame(
        [(i, "en", n) for i, n in enumerate([5, 6, 6, 100, 101, 1, 0])],
        "doc_id long, lang string, n_tok int",
    )
    out = length_bucketed_batches(df, "n_tok", 128, ["lang"], ["doc_id"])
    rows_ = {r["doc_id"]: r for r in out.collect()}
    # padding bound: every doc's padded cost uses its bucket cap, and
    # cap/n_tok <= growth for non-degenerate docs
    for r in rows_.values():
        if r["n_tok"] > 1:
            assert r["n_tok"] <= r["bucket_cap"] <= 128
            # geometric bound + <=1 token of integer-ceiling slack
            assert r["bucket_cap"] <= 1.25 * r["n_tok"] + 1
    # batch capacity: rows per batch x cap <= budget
    from collections import Counter
    per_batch = Counter(
        (r["lang"], r["length_bucket"], r["batch_id"]) for r in rows_.values()
    )
    for (lang, b, bid), cnt in per_batch.items():
        cap = next(r["bucket_cap"] for r in rows_.values()
                   if r["length_bucket"] == b)
        assert cnt * cap <= 128
    # zero/one-token docs land in bucket 0
    assert rows_[5]["length_bucket"] == 0 and rows_[6]["length_bucket"] == 0
    # deterministic across partitionings
    out2 = length_bucketed_batches(
        df.repartition(3), "n_tok", 128, ["lang"], ["doc_id"]
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out2.collect()))


def test_length_bucketed_batches_overlong_doc_raises(spark):
    import pytest as _pytest

    from gdp_etl_spark.operators.packing import length_bucketed_batches

    df = spark.createDataFrame(
        [(1, "en", 9999)], "doc_id long, lang string, n_tok int"
    )
    with _pytest.raises(Exception, match="cannot batch under budget"):
        length_bucketed_batches(df, "n_tok", 128, ["lang"], ["doc_id"]).collect()


# ---------------------------------------------------------------------------
# sliding-window chunking
# ---------------------------------------------------------------------------

def test_chunk_documents_overlapping_windows(spark):
    from gdp_etl_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, ""), (4, None), (5, "  lone  ")],
        "doc_id bigint, text string",
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["chunk_tokens"])
        for r in chunk_documents(df, "text", "doc_id", size=4, stride=2).collect()
    }
    assert got == {
        (1, 0): ("a b c d", 4),
        (1, 1): ("c d e f", 4),
        (1, 2): ("e f g", 3),
        (1, 3): ("g", 1),
        (2, 0): ("x y", 2),
        (5, 0): ("lone", 1),  # whitespace-padded doc trims to one token
    }  # empty / NULL docs produce no chunks


def test_chunk_documents_disjoint_default_and_min_tokens(spark):
    from gdp_etl_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e f g")], "doc_id bigint, text string"
    )
    disjoint = chunk_documents(df, "text", "doc_id", size=3)
    assert [(r["chunk_id"], r["chunk_text"]) for r in
            disjoint.orderBy("chunk_id").collect()] == [
        (0, "a b c"), (1, "d e f"), (2, "g")
    ]
    pruned = chunk_documents(df, "text", "doc_id", size=4, stride=2,
                             min_tokens=2)
    assert [r["chunk_id"] for r in pruned.orderBy("chunk_id").collect()] == [0, 1, 2]


def test_chunk_documents_is_shuffle_free(spark):
    from gdp_etl_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    plan = chunk_documents(df, "text", "doc_id", size=2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan  # map-only: chunking must not shuffle


def test_chunk_documents_rejects_bad_params(spark):
    from gdp_etl_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", size=0)
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", size=4, stride=0)
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", size=4, min_tokens=0)


class TestVocabTopCoverage:
    """Token-vocabulary construction with corpus-coverage statistics."""

    def _run(self, spark, texts, k=10):
        from gdp_etl_spark.operators.profile import vocab_top_coverage

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
        )
        return vocab_top_coverage(df, "text", k=k).collect()

    def test_counts_ranks_and_coverage(self, spark):
        rows = self._run(spark, ["a a b", "a b c"])
        # corpus: a x3, b x2, c x1 (6 occurrences)
        assert [(r["token"], r["cnt"], r["rank"]) for r in rows] == [
            ("a", 3, 1), ("b", 2, 2), ("c", 1, 3),
        ]
        assert rows[0]["share"] == 3 / 6
        assert [r["cum_share"] for r in rows] == [3 / 6, 5 / 6, 6 / 6]

    def test_ties_rank_alphabetically(self, spark):
        rows = self._run(spark, ["z q z q"])
        assert [(r["token"], r["rank"]) for r in rows] == [("q", 1), ("z", 2)]

    def test_k_truncates_but_shares_use_full_total(self, spark):
        rows = self._run(spark, ["a a a b b c"], k=1)
        assert len(rows) == 1
        assert rows[0]["token"] == "a"
        # share is against ALL 6 occurrences, not the top-k subset
        assert rows[0]["share"] == 3 / 6 and rows[0]["cum_share"] == 3 / 6

    def test_blank_and_null_docs_contribute_nothing(self, spark):
        rows = self._run(spark, ["", "   ", None, "only token token"])
        assert [(r["token"], r["cnt"]) for r in rows] == [
            ("token", 2), ("only", 1),
        ]

    def test_lowercasing_merges_case_variants(self, spark):
        rows = self._run(spark, ["The the THE"])
        assert [(r["token"], r["cnt"]) for r in rows] == [("the", 3)]


class TestSourceReport:
    """Per-source health dashboard: exact counts, dup rate, fixed-point
    mean quality, language entropy."""

    def _docs(self, spark):
        rows = [
            # src a: 3 docs, one exact dup pair, two langs
            (1, "the quick brown fox jumps over the lazy dog", "en", "a"),
            (2, "the quick brown fox jumps over the lazy dog", "en", "a"),
            (3, "der hund und die katze sind nicht da heute", "de", "a"),
            # src b: 2 docs, unique, one lang
            (4, "a completely different document about spark", "en", "b"),
            (5, "and another one that is also unique here", "en", "b"),
        ]
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        )

    def test_counts_dup_rate_and_langs(self, spark):
        from gdp_etl_spark.plans.corpus import source_report

        got = {r["source"]: r for r in source_report(self._docs(spark)).collect()}
        a, b = got["a"], got["b"]
        assert (a["n_docs"], a["n_distinct_texts"], a["n_langs"]) == (3, 2, 2)
        assert abs(a["dup_rate"] - (1 - 2 / 3)) < 1e-12
        assert (b["n_docs"], b["n_distinct_texts"], b["n_langs"]) == (2, 2, 1)
        assert b["dup_rate"] == 0.0
        assert b["lang_entropy"] == 0.0  # single language -> zero entropy
        import math
        expect = -(2/3) * math.log(2/3) - (1/3) * math.log(1/3)
        assert abs(a["lang_entropy"] - expect) < 1e-6  # 1e9 quantization

    def test_token_totals_and_quality_bounds(self, spark):
        from gdp_etl_spark.plans.corpus import source_report

        got = {r["source"]: r for r in source_report(self._docs(spark)).collect()}
        assert got["a"]["n_tokens"] == 9 + 9 + 9
        assert got["b"]["n_tokens"] == 6 + 8
        for r in got.values():
            assert 0.0 <= r["mean_quality"] <= 1.0

    def test_partition_count_invariant(self, spark):
        from gdp_etl_spark.plans.corpus import source_report

        docs = self._docs(spark)
        a = sorted(map(tuple, source_report(docs).collect()))
        b = sorted(map(tuple, source_report(docs.repartition(7)).collect()))
        assert a == b


class TestContaminationOverlapFraction:
    """GPT-3/PaLM dirty-document criterion: fraction of a doc's distinct
    shingles found in the benchmark, integer-millis threshold."""

    def _run(self, spark, rows, bench_ids, k=8, t=0.5):
        from gdp_etl_spark.operators.decontam import (
            contamination_overlap_fraction,
        )

        df = spark.createDataFrame(rows, "doc_id int, text string")
        bench = df.filter(F.col("doc_id").isin(bench_ids))
        return {
            r["doc_id"]: (
                r["n_shingles"], r["n_overlap"], r["overlap_frac"],
                r["is_dirty"],
            )
            for r in contamination_overlap_fraction(
                df, bench, "text", "doc_id", shingle_k=k, frac_threshold=t
            ).collect()
        }

    def test_fraction_scales_with_doc_size(self, spark):
        got = self._run(spark, [
            (1, "a b c d e f g h i j"),                # the benchmark doc
            (2, "a b c d e f g h i j k l m n o p q"),  # quotes it: 3/10
            (3, "z y x w v u t s r q"),                # disjoint
        ], bench_ids=[1])
        assert got[1] == (3, 3, 1.0, True)      # benchmark ⊆ itself
        assert got[2] == (10, 3, 0.3, False)    # long doc: diluted
        assert got[3] == (3, 0, 0.0, False)

    def test_threshold_boundary_is_exact(self, spark):
        # 1 of 2 shingles = exactly 0.5: >= keeps it dirty, in millis
        got = self._run(
            spark,
            [(1, "a b c d e f g h"), (2, "a b c d e f g h i")],
            bench_ids=[1], t=0.5,
        )
        assert got[2] == (2, 1, 0.5, True)
        got = self._run(
            spark,
            [(1, "a b c d e f g h"), (2, "a b c d e f g h i")],
            bench_ids=[1], t=0.501,
        )
        assert got[2][3] is False

    def test_null_and_empty_docs_never_dirty(self, spark):
        got = self._run(spark, [(1, "a b c d e f g h"), (2, None), (3, "")],
                        bench_ids=[1])
        assert got[2] == (0, 0, None, False)
        assert got[3] == (0, 0, None, False)


class TestPerGroupQuantileFilter:
    """Per-domain quality gate: each group keeps rows at/above its OWN
    exact interpolated quantile."""

    def _df(self, spark):
        rows = [("a", float(v)) for v in range(1, 9)] + [
            ("b", float(v)) for v in (100, 200, 300, 400)
        ]
        return spark.createDataFrame(rows, "g string, v double")

    def test_each_group_uses_its_own_threshold(self, spark):
        from gdp_etl_spark.operators.profile import per_group_quantile_filter

        kept = per_group_quantile_filter(self._df(spark), "g", "v", 0.25)
        rows = sorted((r["g"], r["v"], r["threshold"]) for r in kept.collect())
        # a: p25 of 1..8 = 2.75 -> 3..8 survive; b: p25 = 175 -> 200..400
        assert [r for r in rows if r[0] == "a"] == [
            ("a", float(v), 2.75) for v in range(3, 9)
        ]
        assert [r[1] for r in rows if r[0] == "b"] == [200.0, 300.0, 400.0]

    def test_keep_below_and_tie_inclusion(self, spark):
        from gdp_etl_spark.operators.profile import per_group_quantile_filter

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 3.0), ("a", 100.0)],
            "g string, v double",
        )
        # p50 of [1,2,2,3,100] = 2.0; ties at the threshold are kept
        up = per_group_quantile_filter(df, "g", "v", 0.5, keep="above")
        assert sorted(r["v"] for r in up.collect()) == [2.0, 2.0, 3.0, 100.0]
        down = per_group_quantile_filter(df, "g", "v", 0.5, keep="below")
        assert sorted(r["v"] for r in down.collect()) == [1.0, 2.0, 2.0]

    def test_invalid_keep_raises(self, spark):
        from gdp_etl_spark.operators.profile import per_group_quantile_filter

        with pytest.raises(ValueError, match="keep"):
            per_group_quantile_filter(self._df(spark), "g", "v", 0.5, "up")

    def test_broadcast_threshold_join(self, spark):
        """The threshold side (one row per group) must broadcast — the
        gate adds no data-scale shuffle beyond the percentile agg."""
        from gdp_etl_spark.operators.profile import per_group_quantile_filter

        plan = per_group_quantile_filter(
            self._df(spark), "g", "v", 0.25
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestTemperatureMix:
    """p ∝ f^alpha domain mixing: scarce domains keep a larger share of
    themselves than abundant ones; deterministic ppm-quantized rates."""

    def _df(self, spark):
        rows = [(i, "big", 100) for i in range(900)] + [
            (10_000 + i, "small", 100) for i in range(100)
        ]
        return spark.createDataFrame(rows, "k long, dom string, toks int")

    def test_alpha_damps_abundant_domains(self, spark):
        from gdp_etl_spark.operators.sampling import temperature_mix

        out = temperature_mix(
            self._df(spark), "k", "dom", "toks", budget=50_000, alpha=0.5
        )
        rates = {
            r["dom"]: r["rate_ppm"]
            for r in out.select("dom", "rate_ppm").distinct().collect()
        }
        # f = 90k vs 10k; shares sqrt(9):sqrt(1) = 3:1 of the 50k budget
        # -> big keeps 37.5k/90k (41.6%), small 12.5k/10k -> capped 1.0
        assert rates["small"] == 1_000_000
        assert abs(rates["big"] - 416_666) <= 1
        kept = out.groupBy("dom").count().collect()
        frac = {r["dom"]: r["count"] for r in kept}
        assert frac["small"] == 100                 # fully kept
        assert 0.35 * 900 < frac["big"] < 0.48 * 900

    def test_alpha_one_is_natural_proportions(self, spark):
        from gdp_etl_spark.operators.sampling import temperature_mix

        out = temperature_mix(
            self._df(spark), "k", "dom", "toks", budget=50_000, alpha=1.0
        )
        rates = {
            r["dom"]: r["rate_ppm"]
            for r in out.select("dom", "rate_ppm").distinct().collect()
        }
        # alpha=1: every domain keeps the same budget/total fraction
        assert rates["big"] == rates["small"] == 500_000

    def test_deterministic_and_invalid_alpha(self, spark):
        import pytest

        from gdp_etl_spark.operators.sampling import temperature_mix

        a = {r["k"] for r in temperature_mix(
            self._df(spark), "k", "dom", "toks", 30_000, 0.5).collect()}
        b = {r["k"] for r in temperature_mix(
            self._df(spark), "k", "dom", "toks", 30_000, 0.5).collect()}
        assert a == b and len(a) > 0
        with pytest.raises(ValueError, match="alpha"):
            temperature_mix(self._df(spark), "k", "dom", "toks", 1000, 1.5)


class TestCurationAudit:
    """Per-document curation provenance: first-removing stage in the
    curate_corpus admission order, 'kept' otherwise."""

    def test_each_stage_claims_its_doc(self, spark):
        from gdp_etl_spark.plans.corpus import curation_audit

        good = ("the quick brown fox jumps over the lazy dog and then "
                "it runs far away to the old green park near the river")
        near = good.replace("river", "lake")
        rows = [
            (1, good),                                   # kept (canonical)
            (2, "x"),                                    # quality
            (3, "spam spam spam spam spam spam spam spam"),  # repetition
            (4, good + " benchmark overlap sentence"),   # near-dup of 1
            (5, good),                                   # exact dup of 1
            (6, near),                                   # near dup of 1
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        bench = spark.createDataFrame(
            [(100, "totally separate benchmark passage that is long "
                   "enough to form shingles of five tokens")],
            "doc_id long, text string",
        )
        out = curation_audit(docs, bench, min_quality=0.5, max_dup3=0.5)
        got = {r["doc_id"]: r["verdict"] for r in out.collect()}
        assert got[1] == "kept"
        assert got[2] == "quality"
        assert got[3] == "repetition"
        assert got[5] == "exact_dup"
        assert got[6] == "near_dup"
        assert set(got) == {1, 2, 3, 4, 5, 6}

    def test_decontamination_precedes_dedup(self, spark):
        from gdp_etl_spark.plans.corpus import curation_audit

        text = ("a perfectly reasonable training document about spark "
                "query engines running at very large scale in production")
        docs = spark.createDataFrame(
            [(1, text), (2, text)], "doc_id long, text string"
        )
        bench = spark.createDataFrame(
            [(9, text)], "doc_id long, text string"
        )
        out = curation_audit(docs, bench, min_quality=0.0, max_dup3=1.0)
        got = {r["doc_id"]: r["verdict"] for r in out.collect()}
        # both docs overlap the benchmark: decontamination removes them
        # BEFORE the dedup stages can (order matters)
        assert got == {1: "decontaminated", 2: "decontaminated"}

    def test_verdict_partition_is_total(self, spark):
        """Every input doc gets exactly one verdict and the kept set
        equals curate_corpus's survivor ids on the same inputs."""
        from gdp_etl_spark.plans.corpus import curate_corpus, curation_audit

        docs = (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "lang", "text")
        )
        bench = docs.filter(F.col("doc_id") % 50 == 0)
        audit = curation_audit(docs, bench)
        assert audit.count() == docs.count()
        kept = {r["doc_id"] for r in audit.filter(
            F.col("verdict") == "kept").collect()}
        survivors = {
            r["doc_id"]
            for r in curate_corpus(docs, bench).select("doc_id").collect()
        }
        assert kept == survivors and len(kept) > 0


class TestStripMarkup:
    """WET-style markup extraction (functions.text.strip_markup):
    script/style drop WITH content, comments drop, tags become word
    boundaries, entities decode with &amp; last."""

    def _run(self, spark, vals):
        from gdp_etl_spark.functions.text import strip_markup

        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "i int, t string"
        )
        rows = df.select("i", strip_markup(F.col("t")).alias("s")).collect()
        return [r["s"] for r in sorted(rows, key=lambda r: r["i"])]

    def test_full_document(self, spark):
        got = self._run(spark, [
            '<html><head><style>p{c:red}</style></head><body>'
            '<script>var a="<b>";</script><h1>Title</h1>'
            '<p class="x">A &amp;lt; B &amp; C&nbsp;&#39;q&#39;</p>'
            '<!-- crawl note --><p>tail</p></body></html>',
        ])
        # &amp;lt; decodes to the LITERAL &lt; (amp last), not to <
        assert got[0] == "Title A &lt; B & C 'q' tail"

    def test_tags_are_word_boundaries(self, spark):
        got = self._run(spark, ["a<br>b", "a<b>bold</b>c"])
        assert got[0] == "a b"
        assert got[1] == "a bold c"

    def test_null_and_plain_text(self, spark):
        got = self._run(spark, [None, 'plain &quot;text&quot;'])
        assert got[0] == ""
        assert got[1] == 'plain "text"'

    def test_script_content_never_leaks(self, spark):
        got = self._run(spark, [
            '<script type="text/javascript">secret()</script>ok'
            "<style>.x{display:none}</style>",
        ])
        assert got[0] == "ok"


class TestDedupLinesInDoc:
    """Within-document repeated-line removal (RefinedWeb per-doc rule):
    first occurrence survives, trivial lines always survive, order
    preserved."""

    def _run(self, spark, text, **kw):
        from gdp_etl_spark.functions.text import dedup_lines_in_doc

        df = spark.createDataFrame([(1, text)], "i int, t string")
        return df.select(
            dedup_lines_in_doc(F.col("t"), **kw).alias("s")
        ).collect()[0]["s"]

    def test_keep_first_preserve_order(self, spark):
        got = self._run(
            spark, "HEADER\nbody one\n\nHEADER\nbody two\nbody one\n.\n."
        )
        assert got == "HEADER\nbody one\n\nbody two\n.\n."

    def test_trivial_lines_always_survive(self, spark):
        # blank and single-char lines repeat freely (formatting)
        got = self._run(spark, "x y\n\n\n-\n-\nx y")
        assert got == "x y\n\n\n-\n-"

    def test_min_chars_boundary(self, spark):
        # at min_chars=1 even single-char lines dedup
        got = self._run(spark, "-\n-\nab\nab", min_chars=1)
        assert got == "-\nab"

    def test_null_text_yields_empty(self, spark):
        got = self._run(spark, None)
        assert got == ""

    def test_regex_metachar_separator_is_literal(self, spark):
        # split() takes a regex; an unescaped '|' would split between
        # every character and silently corrupt the doc on rejoin
        got = self._run(spark, "aa|bb|aa", sep="|")
        assert got == "aa|bb"
        got = self._run(spark, "xx.yy.xx", sep=".")
        assert got == "xx.yy"


class TestClusterSafeSplit:
    """Leak-free split for corpora that KEEP near-dups: cluster members
    co-assign (split key = canonical cluster id), isolated docs split
    by their own id, assignment is partitioning-independent."""

    def _fixture(self, spark):
        docs = spark.createDataFrame(
            [(i, f"d{i}") for i in range(12)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
        )
        return docs, pairs

    def test_cluster_members_share_split(self, spark):
        from gdp_etl_spark.operators.sampling import cluster_safe_split

        docs, pairs = self._fixture(spark)
        got = {
            r["doc_id"]: (r["cluster_id"], r["split"])
            for r in cluster_safe_split(docs, pairs, "doc_id").collect()
        }
        assert got[1] == got[2] == got[3]          # chain co-assigns
        assert got[7] == got[8]
        assert got[1][0] == 1 and got[7][0] == 7   # canonical = min id
        assert got[5][0] == 5                      # isolated: own id
        assert len(got) == 12                      # total function

    def test_partitioning_independent(self, spark):
        from gdp_etl_spark.operators.sampling import cluster_safe_split

        docs, pairs = self._fixture(spark)
        a = {r["doc_id"]: r["split"]
             for r in cluster_safe_split(
                 docs.repartition(1), pairs, "doc_id").collect()}
        b = {r["doc_id"]: r["split"]
             for r in cluster_safe_split(
                 docs.repartition(7), pairs, "doc_id").collect()}
        assert a == b

    def test_leak_prevented_vs_doc_id_split(self, spark):
        """The defining property: a near-dup pair whose DOC ids hash to
        different splits must still co-assign under the cluster key."""
        from gdp_etl_spark.operators.sampling import (
            cluster_safe_split,
            hash_split,
        )

        docs = spark.createDataFrame(
            [(i, f"d{i}") for i in range(200)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(0, 200, 2)], "id_a long, id_b long"
        )
        naive = {r["doc_id"]: r["split"]
                 for r in hash_split(docs, "doc_id").collect()}
        # the naive per-doc split DOES straddle at least one pair
        assert any(naive[i] != naive[i + 1] for i in range(0, 200, 2))
        safe = {r["doc_id"]: r["split"]
                for r in cluster_safe_split(docs, pairs, "doc_id").collect()}
        assert all(safe[i] == safe[i + 1] for i in range(0, 200, 2))


def test_pack_segments_invariants(spark):
    """The spanning packer's defining properties, on a fixture with a
    multi-pack document: (1) every pack except the last is EXACTLY
    full; (2) a document's segments are contiguous in both doc and
    stream coordinates and sum to its token count; (3) pack_offset is
    consistent with pack fullness; (4) zero-token docs vanish; (5) the
    layout is deterministic across repartitionings."""
    from pyspark.sql import functions as F

    from gdp_etl_spark.operators.packing import pack_segments

    rows = [(i, 7 + (i * 13) % 40) for i in range(60)] + [
        (100, 135),  # spans multiple 32-token packs
        (101, 0),    # zero-token doc: dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = pack_segments(df, "doc_id", "n", seq_len=32).collect()
    assert not any(r.doc_id == 101 for r in out)

    per_pack = {}
    per_doc = {}
    for r in out:
        per_pack[r.pack_id] = per_pack.get(r.pack_id, 0) + r.seg_tokens
        per_doc.setdefault(r.doc_id, []).append(r)
    last = max(per_pack)
    assert all(v == 32 for p, v in per_pack.items() if p != last)
    assert per_pack[last] <= 32
    total = sum(n for _, n in rows if n > 0)
    assert sum(per_pack.values()) == total

    n_by_id = dict(rows)
    for doc, segs in per_doc.items():
        segs.sort(key=lambda r: r.pack_id)
        # doc coverage: offsets tile [0, n) contiguously
        assert segs[0].doc_offset == 0
        acc = 0
        for s in segs:
            assert s.doc_offset == acc and s.seg_tokens > 0
            acc += s.seg_tokens
        assert acc == n_by_id[doc]
        # stream contiguity: every later segment starts at pack start,
        # and the previous segment filled its pack to the brim
        for prev, s in zip(segs, segs[1:]):
            assert s.pack_id == prev.pack_id + 1 and s.pack_offset == 0
            assert prev.pack_offset + prev.seg_tokens == 32

    again = pack_segments(
        df.repartition(7), "doc_id", "n", seq_len=32
    ).collect()
    key = lambda r: (r.doc_id, r.pack_id, r.doc_offset, r.pack_offset,
                     r.seg_tokens)
    assert sorted(map(key, out)) == sorted(map(key, again))

    import pytest as _pytest
    with _pytest.raises(ValueError, match="seq_len"):
        pack_segments(df, "doc_id", "n", seq_len=0)
    with _pytest.raises(ValueError, match="collide"):
        pack_segments(df.withColumn("pack_id", F.lit(1)), "doc_id", "n", 32)


def test_scrub_contaminated_spans(spark):
    """Span-level decontamination: only tokens covered by a
    benchmark-overlapping k-gram window are removed — mid-document
    quotes lose the quote, not the document; clean docs pass through
    token-normalized; a short doc whose WHOLE text is benchmark text
    scrubs to empty (the <k-token whole-text-window convention); NULL
    text yields '' with 0 removed."""
    from gdp_etl_spark.operators.decontam import (
        benchmark_shingle_hashes,
        scrub_contaminated_spans,
    )

    bench_text = "q1 q2 q3 q4"  # 4 tokens, k=3 -> windows q1-3, q2-4
    bench = spark.createDataFrame([(bench_text,)], "text string")
    hashes = benchmark_shingle_hashes(bench, "text", shingle_k=3)
    docs = spark.createDataFrame(
        [
            # quote embedded mid-doc: windows at 4,5 cover tokens 4..7
            (1, "a1 a2 a3 q1 q2 q3 q4 b1 b2"),
            (2, "clean   document with  odd   spacing"),
            (3, "q2 q3"),      # short doc, whole text ≠ any bench gram
            (4, None),
            (5, "q1 q2 q3"),   # exact benchmark window -> fully scrubbed
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.text_clean, r.n_removed_tokens)
        for r in scrub_contaminated_spans(
            docs, hashes, "text", "doc_id", shingle_k=3
        ).collect()
    }
    assert got[1] == ("a1 a2 a3 b1 b2", 4)
    assert got[2] == ("clean document with odd spacing", 0)
    assert got[3] == ("q2 q3", 0)
    assert got[4] == ("", 0)
    assert got[5] == ("", 3)
    # clash guard: re-feeding a scrub output (or any frame with the
    # output/temp names) raises instead of silently overwriting
    import pytest as _pytest
    from pyspark.sql import functions as _F
    with _pytest.raises(ValueError, match="collide"):
        scrub_contaminated_spans(
            docs.withColumn("text_clean", _F.lit("x")),
            hashes, "text", "doc_id", shingle_k=3,
        )


def test_dsir_weights_semantics(spark):
    """DSIR sanity on a planted corpus: documents made of TARGET-style
    bigrams must outscore documents of background-only bigrams (the
    defining monotonicity), a gramless doc scores (0, 0), and the
    weights are deterministic across repartitionings."""
    from gdp_etl_spark.operators.sampling import dsir_weights

    target = spark.createDataFrame(
        [(i, "clean helpful prose about science topics") for i in range(8)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(1, "clean helpful prose about science topics"),  # target-like
         (2, "zz9 qq8 xx7 vv6 ww5 uu4"),                   # junk-only
         (3, "")],                                          # gramless
        "doc_id long, text string",
    )
    # raw distribution = the scored docs themselves (junk inflates its
    # own raw counts, deflating its weight further — fine for the test)
    out = {r.doc_id: (r.n_grams, r.dsir_qsum)
           for r in dsir_weights(docs, target, "text", "doc_id",
                                 n=2).collect()}
    assert out[3] == (0, 0)
    assert out[1][0] == 5 and out[2][0] == 5
    # per-gram normalized comparison (equal gram counts here)
    assert out[1][1] > out[2][1]

    again = {r.doc_id: (r.n_grams, r.dsir_qsum)
             for r in dsir_weights(docs.repartition(5), target,
                                   "text", "doc_id", n=2).collect()}
    assert again == out

    import pytest as _pytest
    with _pytest.raises(ValueError, match="num_buckets"):
        dsir_weights(docs, target, "text", "doc_id", num_buckets=1)


def test_dsir_select_budget_prefix_and_determinism(spark):
    """dsir_select keeps exactly the ranked prefix within the token
    budget (boundary doc dropped), the selected set is identical
    across partition counts, and a non-positive budget is rejected."""
    import pytest as _pytest

    from gdp_etl_spark.functions.text import ws_tokens
    from gdp_etl_spark.operators.sampling import dsir_select, dsir_weights

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "lang",
        F.size(ws_tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    target = docs.filter((F.col("lang") == "en") & (F.col("doc_id") % 3 == 0))
    budget = 2_000

    sel = dsir_select(
        docs, target, "text", "doc_id", "n_tokens", budget=budget
    ).collect()
    assert sel, "budget must select something at this SF"
    assert max(r.cum_tokens for r in sel) <= budget

    # reference rule: sort ALL docs by (qsum desc, id), cut the prefix
    w = {r.doc_id: r.dsir_qsum for r in dsir_weights(
        docs, target, "text", "doc_id").collect()}
    toks = {r.doc_id: r.n_tokens for r in docs.select(
        "doc_id", "n_tokens").collect()}
    ranked = sorted(toks, key=lambda d: (-w[d], d))
    cum, want = 0, set()
    for d in ranked:
        cum += toks[d]
        if cum > budget:
            break
        want.add(d)
    assert {r.doc_id for r in sel} == want

    # identical selection across partitionings
    again = dsir_select(
        docs, target, "text", "doc_id", "n_tokens",
        budget=budget, num_partitions=3,
    ).collect()
    assert {r.doc_id for r in again} == want

    with _pytest.raises(ValueError, match="budget"):
        dsir_select(docs, target, "text", "doc_id", "n_tokens", budget=0)


def test_dsir_select_data_window_is_partitioned(spark):
    """The budget cumsum's DATA-path window must be partitioned by the
    range-partition id (two-pass prefix sum); the only global window
    allowed is over the per-partition totals frame (≤ num_partitions
    rows — driver-scale)."""
    from gdp_etl_spark.functions.text import ws_tokens
    from gdp_etl_spark.operators.sampling import dsir_select

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select(
        "doc_id", "text", "lang",
        F.size(ws_tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    target = docs.filter((F.col("lang") == "en") & (F.col("doc_id") % 3 == 0))
    plan = (
        dsir_select(docs, target, "text", "doc_id", "n_tokens",
                    budget=2_000, num_partitions=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the DATA window must carry __pid as its PARTITION key followed by
    # the __negq order key — "windowspecdefinition(__pid" alone would
    # also match the offsets frame's orderBy("__pid") global window and
    # pass vacuously if the data window lost its partitioning
    import re

    assert re.search(r"windowspecdefinition\(__pid#\d+, __negq#", plan), plan
    # and no global (unpartitioned) window ordered by the rank key
    assert not re.search(r"windowspecdefinition\(__negq#", plan)


def test_sampling_guards_from_self_review(spark):
    """Round-11 standing-code review findings, pinned: (1)
    weighted_sample never returns zero/NULL-weight rows even when k
    exceeds the positive-weight count (the old -inf score let them pad
    the result); (2) hash_split / temperature_mix / mix_to_budget
    refuse frames already carrying their output columns; (3)
    mix_to_budget's rate DENOMINATOR overflow raises instead of
    silently dropping the domain; (4) length_bucketed_batches raises
    on NULL token counts like it does on over-budget ones."""
    from gdp_etl_spark.operators.packing import length_bucketed_batches
    from gdp_etl_spark.operators.sampling import (
        hash_split,
        mix_to_budget,
        temperature_mix,
        weighted_sample,
    )

    docs = spark.createDataFrame(
        [(1, 10), (2, 5), (3, 0), (4, None), (5, -2)],
        "doc_id long, w int",
    )
    got = {r.doc_id for r in weighted_sample(docs, "doc_id", "w", k=5).collect()}
    assert got == {1, 2}

    labelled = spark.createDataFrame([(1, "train")], "doc_id long, split string")
    with pytest.raises(ValueError, match="split"):
        hash_split(labelled, "doc_id")

    rated = spark.createDataFrame(
        [(1, "web", 10, 7)], "doc_id long, dom string, toks int, rate_ppm int"
    )
    with pytest.raises(ValueError, match="rate_ppm"):
        temperature_mix(rated, "doc_id", "dom", "toks", budget=10)
    with pytest.raises(ValueError, match="rate_ppm"):
        mix_to_budget(rated, "doc_id", "dom", "toks", 10, {"web": 1})

    # denominator wrap: total_w=1e9, one domain holding 1e10 tokens —
    # the old code wrapped int64 negative and dropped the domain
    big = spark.createDataFrame(
        [(1, "web", (1 << 34))], "doc_id long, dom string, toks long"
    )
    import pyspark.errors

    with pytest.raises(Exception, match="denominator would wrap"):
        mix_to_budget(
            big, "doc_id", "dom", "toks", 1000,
            {"web": 1, "code": 999_999_999},
        ).collect()

    nulltok = spark.createDataFrame(
        [(1, "s", 5), (2, "s", None)], "doc_id long, shard string, n int"
    )
    with pytest.raises(Exception, match="NULL or"):
        length_bucketed_batches(
            nulltok, "n", 100, ["shard"], ["doc_id"]
        ).collect()


def test_decontam_guards_from_self_review(spark):
    """Round-11 standing-code review of decontam.py/retrieval.py,
    pinned: (1) a contaminated NULL-id doc RAISES instead of silently
    passing every screen (NULL never equi-joins); (2) the fraction
    threshold uses floor-ppm, so a doc exactly AT a fractional
    threshold like 1/3 is flagged (the old ceil-millis under-flagged
    it); (3) mismatched embedding dims raise instead of returning an
    empty flag set; (4) bm25 matches mixed-case query terms (document
    tokens are lowercased); (5) output-column clashes raise."""
    from gdp_etl_spark.operators.decontam import (
        contamination_overlap_fraction,
        decontaminate,
        semantic_decontaminate,
    )
    from gdp_etl_spark.operators.retrieval import bm25_topk

    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over the lazy dog")],
        "doc_id bigint, text string",
    )
    nullid = spark.createDataFrame(
        [(None, "quick brown fox jumps over the lazy dog today")],
        "doc_id bigint, text string",
    )
    with pytest.raises(Exception, match="non-NULL"):
        decontaminate(nullid, bench, "text", "doc_id", shingle_k=8).collect()

    # exactly 1 of 3 distinct shingles shared, threshold 1/3: must flag
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j")],  # 3 distinct 8-shingles
        "doc_id bigint, text string",
    )
    b2 = spark.createDataFrame(
        [(9, "a b c d e f g h")], "doc_id bigint, text string"
    )
    r = contamination_overlap_fraction(
        docs, b2, "text", "doc_id", shingle_k=8, frac_threshold=1 / 3
    ).collect()[0]
    assert r.n_shingles == 3 and r.n_overlap == 1
    assert r.is_dirty is True

    d768 = spark.createDataFrame(
        [(1, [0.1] * 8)], "vec_id bigint, embedding array<float>"
    )
    b384 = spark.createDataFrame(
        [(2, [0.1] * 4)], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(ValueError, match="dims differ"):
        semantic_decontaminate(d768, b384, "embedding", "vec_id")

    corpus = spark.createDataFrame(
        [(1, "Paris is the capital of France and Paris is large")],
        "doc_id bigint, text string",
    )
    hits = bm25_topk(corpus, ["Paris"], k=5).collect()
    assert len(hits) == 1 and hits[0].doc_id == 1

    flagged = decontaminate(
        spark.createDataFrame([(1, "x")], "doc_id bigint, text string"),
        bench, "text", "doc_id",
    )
    with pytest.raises(ValueError, match="collide"):
        decontaminate(flagged, bench, "text", "doc_id")
    with pytest.raises(ValueError, match="collide"):
        contamination_overlap_fraction(
            contamination_overlap_fraction(
                docs, b2, "text", "doc_id"
            ),
            b2, "text", "doc_id",
        )


def test_semantic_decontaminate_dim_guards(spark):
    """Advisor finding: the limit-1 peek must skip NULL vectors, and a
    WRONG-SIZED vector inside a frame must raise data-side instead of
    cosine-folding to NULL (silent pass)."""
    from pyspark.errors import SparkRuntimeException

    from gdp_etl_spark.operators.decontam import semantic_decontaminate

    bench_vec = [0.5, -0.3, 0.8, 0.1]
    near = [x + 0.001 for x in bench_vec]
    # NULL embedding first so a naive limit(1) peek would sample it
    docs = spark.createDataFrame(
        [(9, None), (10, near)], "vec_id bigint, embedding array<float>"
    )
    bench = spark.createDataFrame(
        [(1, bench_vec)], "vec_id bigint, embedding array<float>"
    )
    out = semantic_decontaminate(
        docs, bench, "embedding", "vec_id", threshold=0.95
    )
    # NULL-vector doc is skippable (cannot be screened), near one flags
    assert rows(out, "vec_id", "n_hits") == [(10, 1)]

    mixed = spark.createDataFrame(
        [(10, near), (11, [0.1, 0.2])],
        "vec_id bigint, embedding array<float>",
    )
    bad = semantic_decontaminate(
        mixed, bench, "embedding", "vec_id", threshold=0.95, dim=4
    )
    with pytest.raises(SparkRuntimeException, match="re-embed"):
        bad.collect()


def test_dsir_select_null_tokens_raise(spark):
    """Advisor finding: a NULL token count is skipped by the window sum,
    inherits the previous cum_tokens, and gets selected WITHOUT
    consuming budget — must raise loudly instead (the
    length_bucketed_batches rule)."""
    from pyspark.errors import SparkRuntimeException

    from gdp_etl_spark.operators.sampling import dsir_select

    docs = spark.createDataFrame(
        [(1, "a b c", 3), (2, "a b", None), (3, "c d", 2)],
        "doc_id bigint, text string, n_tokens bigint",
    )
    target = docs.filter(F.col("doc_id") == 1)
    # the guard fires at call time: dsir_select materializes the ranged
    # frame via localCheckpoint (an action), so the raise is eager
    with pytest.raises(SparkRuntimeException, match="NULL token count"):
        dsir_select(docs, target, "text", "doc_id", "n_tokens", budget=100)

def test_pack_segments_staged_invariants(spark):
    """The stage-pure packer's defining properties (r12 verdict task:
    stage order must survive packing): (1) NO pack spans a stage
    boundary; (2) within a stage every pack except the LAST is exactly
    full; (3) consuming packs by (pack_id, pack_offset) replays the
    (batch_id, pos_in_batch) curriculum order; (4) segments tile each
    document; (5) deterministic across repartitionings; (6) guards."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from gdp_etl_spark.operators.packing import pack_segments_staged

    # 3 stages x ~20 docs, varying lengths, one multi-pack document
    rows = [
        (i, i // 20, (i % 20), 0, 5 + (i * 7) % 23) for i in range(60)
    ] + [(100, 1, 99, 0, 135)]  # long doc inside stage 1
    df = spark.createDataFrame(
        rows, "doc_id long, stage int, batch_id long, pos long, n long"
    )
    out = pack_segments_staged(
        df, "doc_id", "n", seq_len=32, stage_col="stage",
        order_cols=["batch_id", "pos"], pack_id_stride=1000,
    ).collect()

    stage_of = {i: s for i, s, *_ in rows}
    n_of = {i: n for i, *_, n in rows}
    per_pack, per_doc = {}, {}
    for r in out:
        assert r.pack_id // 1000 == r.stage == stage_of[r.doc_id]  # (1)
        per_pack[r.pack_id] = per_pack.get(r.pack_id, 0) + r.seg_tokens
        per_doc.setdefault(r.doc_id, []).append(r)
    for s in (0, 1, 2):
        packs = sorted(p for p in per_pack if p // 1000 == s)
        for p in packs[:-1]:
            assert per_pack[p] == 32                              # (2)
        assert per_pack[packs[-1]] <= 32
        tot = sum(n for i, st, *_, n in rows if st == s and n > 0)
        assert sum(per_pack[p] for p in packs) == tot
    # (3) pack order replays curriculum order within each stage
    first_seg = {
        d: min(segs, key=lambda r: (r.pack_id, r.pack_offset))
        for d, segs in per_doc.items()
    }
    order_in = {
        s: [i for i, st, b, p, n in sorted(rows, key=lambda t: (t[2], t[3], t[0]))
            if st == s and n > 0]
        for s in (0, 1, 2)
    }
    for s in (0, 1, 2):
        got = sorted(
            (d for d in first_seg if stage_of[d] == s),
            key=lambda d: (first_seg[d].pack_id, first_seg[d].pack_offset),
        )
        assert got == order_in[s]
    # (4) doc tiling
    for d, segs in per_doc.items():
        segs.sort(key=lambda r: r.pack_id)
        acc = 0
        for seg in segs:
            assert seg.doc_offset == acc and seg.seg_tokens > 0
            acc += seg.seg_tokens
        assert acc == n_of[d]
    # (5) determinism
    again = pack_segments_staged(
        df.repartition(7), "doc_id", "n", seq_len=32, stage_col="stage",
        order_cols=["batch_id", "pos"], pack_id_stride=1000,
    ).collect()
    key = lambda r: tuple(r)  # noqa: E731
    assert sorted(map(key, out)) == sorted(map(key, again))
    # (6) guards
    with _pytest.raises(ValueError, match="stride"):
        pack_segments_staged(
            df, "doc_id", "n", seq_len=1, stage_col="stage",
            order_cols=["batch_id", "pos"], pack_id_stride=4,
        )
    with _pytest.raises(ValueError, match="NULL stage"):
        pack_segments_staged(
            df.withColumn(
                "stage",
                F.when(F.col("doc_id") == 0, F.lit(None)).otherwise(
                    F.col("stage")
                ),
            ),
            "doc_id", "n", seq_len=32, stage_col="stage",
            order_cols=["batch_id", "pos"],
        )
    with _pytest.raises(ValueError, match="collide"):
        pack_segments_staged(
            df.withColumn("pack_id", F.lit(1)), "doc_id", "n", 32,
            stage_col="stage", order_cols=["batch_id", "pos"],
        )
