"""Preference-pair construction for reward-model / DPO training.

The comparison-data step every RLHF-family pipeline runs (InstructGPT's
comparison collection, Rafailov et al. 2023's DPO pairs): given scored
responses grouped by prompt, emit ``(prompt, chosen, rejected)`` pairs
with a minimum score gap.  Two modes, both deterministic and
SQL-replayable:

* ``mode="extreme"`` — one pair per group: the best response vs the
  worst (ties break to the SMALLER id on both sides — the repo's
  keep-best discipline).  One map-side-combined aggregate; the group
  never materializes.
* ``mode="all"`` — every strictly-ordered pair whose gap clears
  ``min_gap`` (the all-comparisons regime reward-model training uses).
  The self-join is on the group key, so the candidate space is
  Σ|group|² — bounded ONLY because responses-per-prompt is bounded by
  construction; ``max_group_size`` enforces that contract loudly
  instead of letting one degenerate prompt go quadratic.

NULL scores raise (the curriculum_stages rule: an unscored response
has no place in a preference order).

No counterpart exists in the reference repo (a GDP statistics
pipeline); this operator belongs to the beyond-reference LLM-pipeline
surface the brief mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["preference_pairs"]


def preference_pairs(
    df: DataFrame,
    group_col: str,
    id_col: str,
    score_col: str,
    mode: str = "extreme",
    min_gap: float = 0.0,
    max_group_size: int = 64,
) -> DataFrame:
    """Emit ``(group_col, chosen_id, rejected_id, chosen_score,
    rejected_score, gap)`` preference pairs (see module docstring).

    ``extreme``: the per-group (max-score, min-id-tie-break) response
    vs the (min-score, min-id-tie-break) one; groups where the gap is
    below ``min_gap`` — including single-response groups, gap 0 against
    themselves — emit nothing.  ``all``: every pair with
    ``chosen.score > rejected.score`` and gap >= ``min_gap``; ties
    never pair (a strict preference is what the loss consumes).

    Scale shape: ``extreme`` is ONE groupBy with two struct-ordered
    min/max aggregates (map-side partial, no group materialization);
    ``all`` is a group-keyed equi-self-join over groups whose size is
    pre-checked against ``max_group_size`` (one count window, loud
    raise) — never corpus-quadratic.
    """
    if mode not in ("extreme", "all"):
        raise ValueError(f"mode must be 'extreme' or 'all', got {mode!r}")
    guard = F.when(
        F.col(score_col).isNull(),
        F.raise_error(
            F.concat(
                F.lit("preference_pairs: NULL score for "),
                F.col(id_col).cast("string"),
                F.lit("; score every response before pairing"),
            )
        ).cast("double"),
    ).otherwise(F.col(score_col).cast("double"))
    base = df.select(
        F.col(group_col), F.col(id_col), guard.alias(score_col)
    )
    if mode == "extreme":
        # argmax by (score, -id): highest score, ties to the smaller
        # id; argmin by (score, id): lowest score, ties to the smaller
        # id.  Struct-ordered max_by/min_by — a declarative aggregate,
        # so Catalyst plans a map-side partial.
        neg_id = F.col(id_col).cast("bigint") * F.lit(-1)
        agg = base.groupBy(group_col).agg(
            F.max_by(
                F.struct(
                    F.col(id_col).alias("id"),
                    F.col(score_col).alias("score"),
                ),
                F.struct(F.col(score_col), neg_id),
            ).alias("__c"),
            F.min_by(
                F.struct(
                    F.col(id_col).alias("id"),
                    F.col(score_col).alias("score"),
                ),
                F.struct(F.col(score_col), F.col(id_col).cast("bigint")),
            ).alias("__r"),
        )
        out = agg.select(
            group_col,
            F.col("__c.id").alias("chosen_id"),
            F.col("__r.id").alias("rejected_id"),
            F.col("__c.score").alias("chosen_score"),
            F.col("__r.score").alias("rejected_score"),
            (F.col("__c.score") - F.col("__r.score")).alias("gap"),
        )
        return out.filter(
            (F.col("chosen_id") != F.col("rejected_id"))
            & (F.col("gap") >= F.lit(float(min_gap)))
            & (F.col("gap") > F.lit(0.0))
        )
    # mode == "all": guard group sizes BEFORE the self-join — one count
    # window on the group key (the same shuffle the join needs), loud
    # raise on the contract violation instead of a silent n² blowup
    w = Window.partitionBy(group_col)
    sized = base.withColumn("__gn", F.count(F.lit(1)).over(w))
    checked = sized.withColumn(
        "__ok",
        F.when(
            F.col("__gn") > F.lit(int(max_group_size)),
            F.raise_error(
                F.format_string(
                    f"preference_pairs: group %s has %s responses, over "
                    f"max_group_size={int(max_group_size)}; cap or "
                    f"re-shard the prompt groups",
                    F.col(group_col).cast("string"),
                    F.col("__gn").cast("string"),
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True)),
    ).filter(F.col("__ok")).drop("__gn", "__ok").localCheckpoint()
    a, b = checked.alias("a"), checked.alias("b")
    ga, gb = F.col(f"a.{score_col}"), F.col(f"b.{score_col}")
    return (
        a.join(b, F.col(f"a.{group_col}") == F.col(f"b.{group_col}"))
        .filter(
            (ga > gb) & ((ga - gb) >= F.lit(float(min_gap)))
        )
        .select(
            F.col(f"a.{group_col}").alias(group_col),
            F.col(f"a.{id_col}").alias("chosen_id"),
            F.col(f"b.{id_col}").alias("rejected_id"),
            ga.alias("chosen_score"),
            gb.alias("rejected_score"),
            (ga - gb).alias("gap"),
        )
    )
