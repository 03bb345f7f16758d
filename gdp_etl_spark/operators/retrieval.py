"""Ranked retrieval over a document corpus: BM25 top-k and an inverted
index, built purely from DataFrame ops (tokenize → explode → aggregate).

Scale shape (100-TB corpus, 1000 executors):

* tokenize/explode is per-row map work — no shuffle, whole-stage codegen;
* the query-term filter is applied to the exploded stream BEFORE the
  (doc, term) aggregation, so shuffle volume is proportional to matching
  postings only, not corpus token count;
* document frequency / corpus stats are query-vocabulary-sized (tiny) and
  broadcast back — the only full shuffle keys on (doc_id, term), which is
  high-cardinality and naturally skew-free;
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
    tie-break on doc_id.  df/corpus stats are broadcast (query-vocab- and
    scalar-sized); the only big shuffle is the (doc, term) tf aggregation
    over pre-filtered postings.

    Default k1/b are binary-exact doubles (1.5, 0.75) so literal parsing
    is identical across engines (a decimal-parsing engine like DuckDB
    would round 1.2 differently than IEEE text→double in edge cases).
    """
    # persist barrier: the postings feed both the df counts and the
    # scoring probe — without it Catalyst re-scans/explodes the whole
    # corpus for the df branch (no subtree reuse across self-joins);
    # the frame holds query-term postings only, and the bounded top-k
    # result is materialized below before the cache releases
    tf = doc_term_freq(docs, text_col, id_col, terms=query_terms).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # df per term via AGGREGATION + broadcast join-back, not a
    # term-keyed count window: a stop-word query term's postings are
    # corpus-sized, and a window partition is not AQE-divisible — the
    # agg partial-counts map-side and the df table is query-vocab-sized
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = corpus_stats(docs, text_col, id_col)

    scored = (
        tf.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    result = (
        scored.groupBy("doc_id")
        .agg(
            (
                F.sum(F.floor(F.col("term_score") * F.lit(_FP)).cast("bigint")).cast(
                    "double"
                )
                / F.lit(_FP)
            ).alias("score"),
            F.count(F.lit(1)).cast("int").alias("n_terms"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
    )
    # k-bounded eager materialization so the postings cache releases
    # before returning (the repo's prefix-filter discipline);
    # materialize=False returns the lazy plan for inspection/tests and
    # leaves cache release to the caller's first action
    if not materialize:
        return result
    try:
        result = result.localCheckpoint(eager=True)
    finally:
        tf.unpersist()
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
