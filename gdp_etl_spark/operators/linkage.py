"""Probabilistic record linkage — blocked candidate generation plus
Fellegi–Sunter agreement scoring.

Entity resolution is the cross-table sibling of near-dup detection
(dedup.py): two feeds describe the same real-world entities with
dirty, drifting attributes, and the job is match / possible /
non-match per candidate pair.  The classical Fellegi–Sunter model
scores each pair as a sum of per-field log-odds weights: agreement on
a discriminating field adds evidence, disagreement subtracts, a
missing value contributes nothing.

Scale shape: candidates come from an equi-join on a BLOCKING key
(never all-pairs — same discipline as every pair generator in this
package); scoring is pure per-row JVM expressions over the joined
pair.  Weights are integer millis, so scores are exact integer sums —
bit-identical across engines — and the thresholds are plain integer
comparisons.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FieldRule:
    """One field comparison: ``agree`` is a Column over the candidate
    pair (NULL ⇒ field missing on either side ⇒ contributes nothing);
    weights are log-odds in integer millis."""

    name: str
    agree: Column
    w_agree_millis: int
    w_disagree_millis: int


def block_candidates(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[tuple[Column, Column]],
) -> DataFrame:
    """Equi-join candidate generation on derived blocking keys (e.g.
    normalized name token + region).  Returns the joined pair frame;
    callers pick block keys tight enough that within-block fan-out is
    bounded (the blocking-key cardinality is the scale lever)."""
    if not block_cols:
        # a None condition would silently compile to the full cross
        # product — the exact blow-up blocking exists to prevent
        raise ValueError("block_candidates requires at least one blocking key")
    cond = None
    for lcol, rcol in block_cols:
        c = lcol == rcol
        cond = c if cond is None else (cond & c)
    return left.join(right, cond)


def fellegi_sunter_score(
    candidates: DataFrame,
    rules: list[FieldRule],
    upper_millis: int,
    lower_millis: int,
) -> DataFrame:
    """Score each candidate pair: Σ per-field evidence (agree ⇒
    +w_agree, disagree ⇒ −w_disagree, NULL verdict ⇒ 0), then classify
    ``match`` (≥ upper), ``possible`` (≥ lower), else ``non_match``.
    Adds one ``<name>_agree`` boolean per rule, ``score_millis`` and
    ``link_class``."""
    out = candidates
    score = F.lit(0).cast("long")
    for r in rules:
        flag = r.agree
        out = out.withColumn(f"{r.name}_agree", flag)
        score = score + F.when(
            F.col(f"{r.name}_agree").isNull(), F.lit(0)
        ).when(
            F.col(f"{r.name}_agree"), F.lit(r.w_agree_millis)
        ).otherwise(F.lit(-r.w_disagree_millis)).cast("long")
    out = out.withColumn("score_millis", score)
    return out.withColumn(
        "link_class",
        F.when(F.col("score_millis") >= upper_millis, F.lit("match"))
        .when(F.col("score_millis") >= lower_millis, F.lit("possible"))
        .otherwise(F.lit("non_match")),
    )
