"""End-to-end corpus-cleaning plan: the composed LLM-training-data
pipeline built from the operator families (text scoring → filtering →
PII redaction → exact dedup → deterministic sampling).

Stage order is the production order:

1. score on the raw text (quality + language) and filter — cheapest
   first, per-row map work, shrinks everything downstream;
2. redact PII from survivors only (regex chain, map work);
3. exact-dedup on the *redacted* text (two docs differing only in their
   PII are the same training document) — the single shuffle, keyed on
   md5 (16-byte keys);
4. deterministic hash sample — reproducible across runs, engines and
   partitionings, and composable (a 10% sample ⊂ the 20% sample).

Every stage is engine-portable, so the whole chain is oracle-checkable
end to end (``__spark_entry__`` registers it as ``corpus_clean``).  The
iterative near-dup clustering stage (``operators.cluster``) deliberately
sits outside this chain — it is rows-only-checkable and its output is a
pair table, not a document filter; compose via an anti-join against its
``duplicate`` ids when near-dup removal is wanted.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import lang_id, quality_score, redact_pii
from ..operators.sampling import hash_sample


def clean_corpus(
    docs: DataFrame,
    min_quality: float = 0.0,
    langs: Sequence[str] | None = ("en",),
    sample_fraction: float | None = None,
    seed: str = "42",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score → filter → redact → dedup → sample; returns
    (doc_id, lang_pred, quality, text_clean)."""
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__text"),
        quality_score(F.col(text_col)).alias("quality"),
        lang_id(F.col(text_col)).alias("lang_pred"),
    ).filter(F.col("quality") >= F.lit(min_quality))
    if langs is not None:
        d = d.filter(F.col("lang_pred").isin(*langs))
    d = d.withColumn("text_clean", redact_pii(F.col("__text")))
    # keep the lowest doc_id per identical cleaned text: one window
    # shuffle on a 16-byte hash key, no self-join
    w = Window.partitionBy(F.md5(F.col("text_clean"))).orderBy("doc_id")
    d = (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "lang_pred", "quality", "text_clean")
    )
    if sample_fraction is not None:
        d = hash_sample(d, "doc_id", sample_fraction, seed)
    return d
