"""Ranked retrieval over a document corpus: BM25 top-k and an inverted
index, built purely from DataFrame ops (tokenize → explode → aggregate).

Scale shape (100-TB corpus, 1000 executors):

* tokenize/explode is per-row map work — no shuffle, whole-stage codegen;
* BM25 scoring never shuffles document rows at all: per-doc tf for the
  (small) query vocabulary is computed map-side with array HOFs, the
  df/corpus stats collapse to ONE broadcast scalar row, and the top-k is
  TakeOrderedAndProject (k-bounded partial heaps, no sort exchange);
* where a (doc, term) aggregation IS needed (the inverted index), the
  term filter lands on the exploded stream BEFORE the shuffle, so volume
  is matching postings, not corpus token count;
* scores accumulate through fixed-point bigints (`floor(x·1e12)` sums) so
  results are partitioning-independent and engine-portable (the DuckDB
  oracle mirrors the recipe; see ``vectors.dot_fixed`` for the pattern).

The reference has no retrieval operators (it is a GDP ETL job); these are
part of the LLM-training-data operator family (brief: text analysis /
dedup / similarity), sharing the tokenizer with
``functions/text.py:37`` (``ws_tokens``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.text import ws_tokens

_FP = 1_000_000_000_000  # 1e12 fixed-point scale (products stay < 2^53)


def tokenized(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, tokens, dl): lowercased whitespace tokens and document length."""
    toks = ws_tokens(F.lower(F.col(text_col)))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("tokens"),
        F.size(toks).alias("dl"),
    )


def doc_term_freq(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    terms: list[str] | None = None,
) -> DataFrame:
    """(doc_id, term, tf, dl) term frequencies; ``terms`` restricts the
    exploded stream *before* the aggregation shuffle (predicate on the
    map side — at scale this is the difference between shuffling matched
    postings and shuffling the whole corpus)."""
    t = tokenized(docs, text_col, id_col)
    ex = t.select("doc_id", "dl", F.explode("tokens").alias("term")).filter(
        F.col("term") != ""
    )
    if terms is not None:
        ex = ex.filter(F.col("term").isin(*terms))
    return ex.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
    )


def corpus_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Single-row (n_docs, avgdl); avgdl = exact bigint token total
    divided once as double (engine-portable)."""
    t = tokenized(docs, text_col, id_col)
    return t.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.5,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize: bool = True,
) -> DataFrame:
    """Top-k documents by BM25 over ``query_terms``.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln((N − df + ½)/(df + ½) + 1)  (Robertson/Sparck-Jones).

    Per-doc summation goes through ``floor(term_score·1e12)`` bigints so
    the total is independent of term arrival order.  Deterministic
    tie-break on doc_id.

    Shuffle-free shape: a query's vocabulary is a handful of terms, so
    per-doc tf for EVERY query term is computed map-side with array
    higher-order functions in ONE tokenize pass (no explode, no
    (doc, term) shuffle at all); n_docs/avgdl/per-term df collapse into
    a single scalar row (partial-aggregated map-side) broadcast back;
    scoring is then per-row arithmetic and the top-k plans as
    TakeOrderedAndProject (per-partition k-bounded heaps merged on the
    driver — no global sort exchange).  The tokenize pass runs once: the
    narrow per-doc frame (id, dl, k tf ints — no text) is persisted
    across the stats and scoring consumers and released after the
    k-bounded result materializes.

    ``materialize=False`` returns the lazy plan for inspection/tests —
    that path pins NO cache (executing it re-tokenizes once per
    consumer; fine for plan reads, use the default for real queries).

    Default k1/b are binary-exact doubles (1.5, 0.75) so literal parsing
    is identical across engines (a decimal-parsing engine like DuckDB
    would round 1.2 differently than IEEE text→double in edge cases).
    """
    # dedup while preserving order ('' can never match a ws_token)
    # lowercase BEFORE dedup: document tokens are lowercased at
    # tokenization, so a mixed-case query term would silently match
    # nothing (tf = 0 everywhere — self-review finding), and
    # ["The", "the"] must count as ONE logical term
    terms = [
        t for t in dict.fromkeys(q.lower() for q in query_terms)
        if t != ""
    ]
    if not terms:
        raise ValueError("query_terms must contain a non-empty term")

    def _eq(term: str):
        # closure factory — a default-arg capture (lambda x, t=term)
        # would make PySpark build a 2-arg (element, index) HOF lambda
        return lambda x: x == F.lit(term)

    tok = tokenized(docs, text_col, id_col)
    per_doc = tok.select(
        "doc_id",
        "dl",
        *[
            F.size(F.filter(F.col("tokens"), _eq(t))).alias(f"__tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    if materialize:
        per_doc = per_doc.persist(StorageLevel.MEMORY_AND_DISK)
    # ONE scalar row: corpus stats + per-term document frequencies —
    # query-vocab-sized, broadcast back (never a term-keyed shuffle:
    # a stop-word term's postings are corpus-sized)
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )
    joined = per_doc.crossJoin(F.broadcast(stats))
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )

    def _term_score_fp(i: int):
        tf_i = F.col(f"__tf_{i}")
        idf = F.log(
            (F.col("n_docs") - F.col(f"__df_{i}") + F.lit(0.5))
            / (F.col(f"__df_{i}") + F.lit(0.5))
            + F.lit(1.0)
        )
        score = idf * (tf_i * F.lit(k1 + 1.0)) / (tf_i + norm)
        return F.when(
            tf_i > 0, F.floor(score * F.lit(_FP)).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))

    n_terms = sum(
        (F.col(f"__tf_{i}") > 0).cast("int") for i in range(len(terms))
    )
    result = (
        joined.select(
            "doc_id",
            (
                sum(_term_score_fp(i) for i in range(len(terms)))
                .cast("double")
                / F.lit(_FP)
            ).alias("score"),
            n_terms.cast("int").alias("n_terms"),
        )
        .filter(F.col("n_terms") > 0)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
    )
    if not materialize:
        return result
    # k-bounded eager materialization so the per-doc cache releases
    # before returning (the repo's prefix-filter discipline)
    try:
        result = result.localCheckpoint(eager=True)
    finally:
        per_doc.unpersist()
    return result


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """(term, df, postings): sorted distinct posting list per term.

    Distinct (term, doc) pairs first (map-side partial dedup), then one
    shuffle keyed by term.  ``sort_array`` makes the list order
    deterministic (collect order is not).  At 100 TB a hot term's
    postings list would be capped/paged (e.g. ``slice``) before any
    driver-side use; df is carried so consumers can skip stopword-like
    terms without materializing their lists.
    """
    t = tokenized(docs, text_col, id_col)
    pairs = (
        t.select("doc_id", F.explode("tokens").alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )
    return (
        pairs.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("int").alias("df"),
            F.sort_array(F.collect_list("doc_id")).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )


def rrf_fuse(
    rankings: "list[DataFrame]",
    id_col: str = "doc_id",
    k0: int = 60,
    k: int = 10,
    scale: int = 1_000_000_000_000,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists —
    the standard hybrid-retrieval combiner (BM25 + dense ANN): each
    list contributes ``1 / (k0 + rank)`` per item; items high on ANY
    list float to the top without score calibration across systems.

    Fixed-point contract: the contribution is computed as
    ``scale div (k0 + rank)`` in pure BIGINT arithmetic — engine-exact
    (DuckDB ``//`` floors identically on non-negative operands), so
    fused scores hash-match across engines; at the default scale the
    quantization error is 1e-12 per term, far below any rank-swapping
    threshold for k0 >= 1.

    Inputs must carry ``(id_col, rank)`` with rank >= 1 (the usual
    row_number output).  Returns the top-``k`` of
    ``(id_col, rrf_score bigint, n_lists int, best_rank int)`` ordered
    by fused score with the id tie-break.

    Scale shape: each input list is already k-bounded by its producer
    (top-k retrieval output, thousands of rows at most), so the union
    + groupBy is bounded by sum(len(lists)) — never corpus-sized; the
    final top-k plans as TakeOrderedAndProject.
    """
    from functools import reduce

    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranked list")
    if k0 < 1:
        raise ValueError(f"k0 must be >= 1, got {k0}")
    scored = []
    for i, df in enumerate(rankings):
        if "rank" not in df.columns or id_col not in df.columns:
            raise ValueError(
                f"ranking {i} must have columns ({id_col}, rank); "
                f"got {df.columns}"
            )
        # ranks must be >= 1 and non-NULL, loudly (the dsir_select
        # rule): a NULL or negative rank would otherwise be SKIPPED by
        # the fused sum (NULL div, NULL-on-div-by-zero with ANSI off)
        # while still counting toward n_lists — silent score
        # corruption, not an error (review finding)
        guarded = F.when(
            F.col("rank").isNull() | (F.col("rank") < 1),
            F.raise_error(
                F.format_string(
                    f"rrf_fuse: ranking {i} has rank %s for {id_col} "
                    f"%s; ranks must be >= 1",
                    F.coalesce(F.col("rank").cast("string"),
                               F.lit("NULL")),
                    F.col(id_col).cast("string"),
                )
            ).cast("bigint"),
        ).otherwise(F.col("rank").cast("bigint"))
        scored.append(
            df.select(F.col(id_col), guarded.alias("__rankb"))
            .select(
                id_col,
                F.expr(
                    f"cast({int(scale)} as bigint) div "
                    f"(cast({int(k0)} as bigint) + __rankb)"
                ).alias("__rrf"),
                F.col("__rankb").cast("int").alias("__rank"),
                F.lit(i).alias("__list"),
            )
        )
    u = reduce(DataFrame.unionByName, scored)
    fused = u.groupBy(id_col).agg(
        F.sum("__rrf").alias("rrf_score"),
        F.count(F.lit(1)).alias("__n"),
        F.count_distinct(F.col("__list")).alias("__nd"),
        F.min("__rank").alias("best_rank"),
    )
    # a duplicate id WITHIN one list double-counts its reciprocal-rank
    # contribution and inflates n_lists past len(rankings) — silent
    # score corruption, so raise loudly (review finding, round 13);
    # the check rides the existing agg: count vs count_distinct(list),
    # no extra shuffle
    n_lists = F.when(
        F.col("__n") != F.col("__nd"),
        F.raise_error(
            F.format_string(
                f"rrf_fuse: {id_col} %s appears more than once within "
                f"one ranking list; lists must be id-distinct",
                F.col(id_col).cast("string"),
            )
        ).cast("bigint"),
    ).otherwise(F.col("__nd"))
    return (
        fused.select(
            id_col,
            "rrf_score",
            n_lists.cast("int").alias("n_lists"),
            "best_rank",
        )
        .orderBy(F.desc("rrf_score"), id_col)
        .limit(k)
    )
