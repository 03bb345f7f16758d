"""Distributed interpolated Kneser-Ney bigram language model — train
on the corpus, score documents, no external model file.

The CCNet quality-filter recipe (Wenzek et al. 2019) scores documents
with a KenLM n-gram model; the repo's ``char_trigram_lm_score`` covers
the character level with add-one unigrams.  This module is the WORD
level with the real smoothing: interpolated Kneser-Ney (Kneser & Ney
1995; the formulation in Chen & Goodman 1998, eq. 4.26 with a fixed
discount), the estimator KenLM itself implements.

Per scored bigram (w1, w2), with D the discount:

* seen bigram:      ``max(c(w1,w2) - D, 0)/c(w1)
                      + (D · N1+(w1,·)/c(w1)) · Pcont(w2)``
* unseen, w1 seen:  ``(D · N1+(w1,·)/c(w1)) · Pcont(w2)`` — the
  interpolation weight λ(w1) times the continuation probability
* w1 unseen:        ``Pcont(w2)`` (pure continuation backoff)
* w2 unseen:        ``Pcont`` falls back to ``1/(N_bi + 1)`` (one
  pseudo-continuation — keeps every probability strictly positive)

where ``Pcont(w2) = N1+(·,w2)/N_bi`` (how many DISTINCT contexts w2
continues, over the distinct-bigram total — the Kneser-Ney insight:
"Francisco" is frequent but continues only "San").

Determinism: every probability is a fixed expression over BIGINT
counts (double division and one ``ln``, identical IEEE results in any
engine given the same integers); per-bigram log-probs quantize as
``floor(ln(p)·quantize)`` and per-doc sums are exact integer adds —
the same cross-engine contract as ``char_trigram_lm_score``.

Scale shape: training is ONE corpus-scale bigram-count groupBy whose
output is the bigram vocabulary (bounded by language, not corpus —
the bpe_word_freq argument), plus two vocabulary-bounded derived
aggregates (per-context totals/fan-out, per-word continuation counts)
and a 1-row total.  Scoring explodes the scored docs' bigrams once
and left-joins the three model tables on their keys (AQE broadcasts
them when they fit); the per-doc sum is one map-side-combined
groupBy.  No driver-side model state at all — the model IS three
DataFrames, so 10⁹-bigram vocabularies never collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hof import bind_once
from ..functions.text import ws_tokens

__all__ = ["kn_bigram_score"]


def _bigrams(text: Column) -> Column:
    """Array of (w1, w2) structs over lowered whitespace tokens;
    empty for docs with < 2 tokens."""
    def _pairs(ts):
        n = F.size(ts)
        return F.when(n < 2, F.array().cast(
            "array<struct<w1:string,w2:string>>"
        )).otherwise(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.struct(
                    F.element_at(ts, i).alias("w1"),
                    F.element_at(ts, i + 1).alias("w2"),
                ),
            )
        )

    # tokenize ONCE per row (bind_once): a captured token subtree
    # re-splits the text per BIGRAM inside the interpreted lambda
    return bind_once(ws_tokens(F.lower(text)), _pairs)


def kn_bigram_score(
    train_docs: DataFrame,
    score_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    quantize: int = 10**6,
) -> DataFrame:
    """Train the interpolated KN bigram model on ``train_docs`` and
    score ``score_docs`` (see module docstring).  Returns
    ``(id_col, n_bigrams int, sum_logp_q bigint, avg_logp double)`` —
    docs with < 2 tokens report 0 bigrams and NULL ``avg_logp``.
    ``train_docs`` and ``score_docs`` may be the same frame
    (self-perplexity, the corpus-filter shape) or different (held-out
    scoring — the unseen-bigram backoff paths then do real work)."""
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")

    def explode_bigrams(docs: DataFrame) -> DataFrame:
        return docs.select(
            F.col(id_col), F.explode(_bigrams(F.col(text_col))).alias("g")
        ).select(id_col, F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))

    tr = explode_bigrams(train_docs)
    # bigram counts — the one corpus-scale aggregate; materialized via
    # eager localCheckpoint (the repo's barrier idiom,
    # preference.py::preference_pairs) because FOUR consumers read it
    # (ctx, cont, the n_bi count, the score join) and each would
    # otherwise re-run the corpus explode.  localCheckpoint — not
    # persist() — so the blocks are released by the ContextCleaner when
    # the returned frame is dropped; a bare persist() pins the
    # vocabulary-scale cache for the session (the r13 verdict's
    # accreted-RDD finding) since no safe unpersist point exists on a
    # lazily-consumed result.
    big = tr.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    ).localCheckpoint(eager=True)
    # per-context totals + fan-out (vocabulary-bounded)
    ctx = big.groupBy("w1").agg(
        F.sum("c12").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1p_left"),
    )
    # continuation counts + the distinct-bigram total
    cont = big.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1p_right")
    )
    n_bi = big.count()  # bounded action: one long
    if n_bi == 0:
        raise ValueError("kn_bigram_score: training corpus has no bigrams")

    sc = explode_bigrams(score_docs)
    j = (
        sc.join(big, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .join(cont, ["w2"], "left")
    )
    D = F.lit(float(discount))
    nb = F.lit(float(n_bi))
    pc = F.when(
        F.col("n1p_right").isNotNull(),
        F.col("n1p_right").cast("double") / nb,
    ).otherwise(F.lit(1.0) / (nb + F.lit(1.0)))
    lam = (
        D * F.col("n1p_left").cast("double") / F.col("c1").cast("double")
    )
    p = (
        F.when(
            F.col("c12").isNotNull(),
            F.greatest(F.col("c12").cast("double") - D, F.lit(0.0))
            / F.col("c1").cast("double")
            + lam * pc,
        )
        .when(F.col("c1").isNotNull(), lam * pc)   # unseen bigram, seen w1
        .otherwise(pc)                              # unseen context
    )
    logp_q = F.floor(F.log(p) * F.lit(int(quantize))).cast("long")
    per_doc = j.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_bigrams"),
        F.sum(logp_q).alias("sum_logp_q"),
    )
    # LEFT join back so bigram-less docs keep a row (0 / NULL)
    ids = score_docs.select(id_col).distinct()
    return ids.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("int").alias(
            "n_bigrams"
        ),
        F.coalesce(F.col("sum_logp_q"), F.lit(0)).cast("long").alias(
            "sum_logp_q"
        ),
        F.when(
            F.col("n_bigrams").isNotNull(),
            F.col("sum_logp_q").cast("double")
            / F.lit(float(quantize))
            / F.col("n_bigrams").cast("double"),
        ).alias("avg_logp"),
    )
