"""k-anonymity via a generalization ladder — privacy-preserving
release of quasi-identifier (QI) columns (Sweeney 2002; the
suppression-ladder variant of local recoding).

Semantics: rows are emitted at the FINEST ladder level whose
equivalence class (the tuple of generalized QI values, within the
rows still unresolved at that level) reaches size >= k; rows that no
level can anonymize are suppressed (all QI values NULL).  Every
emitted non-suppressed ``(anon_level, qi...)`` class therefore has at
least k members — the k-anonymity guarantee, scoped per level (two
classes at different levels may render the same strings; consumers
must key on ``anon_level`` + QIs, which the output carries).

Scale shape: one count-over-QI-window shuffle per ladder level
(ladder depth is a small constant, 2–4 in practice) over a shrinking
remainder frame; no collect, no cross join, deterministic everywhere
— integer counts and string QI renderings make the whole output
hash-exact across engines.  At 100 TB the level-0 pass dominates and
is a plain keyed aggregation; skewed QI combinations only make groups
SAFER (bigger classes), never slower than the equivalent groupBy.

No counterpart in the reference repo (GDP statistics publishes
aggregates, not microdata); this extends the repo's privacy family
(``pii_redact``, ``pseudonymize``) to record-level release.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["k_anonymize"]


def k_anonymize(
    df: DataFrame,
    ladder: Sequence[Mapping[str, Column]],
    k: int,
    id_col: str,
    materialize: bool = True,
) -> DataFrame:
    """Anonymize ``df`` against a generalization ``ladder``.

    ``ladder[l]`` maps each QI output name to its level-``l``
    generalization expression (rendered as STRING so every level —
    and the suppressed NULL — shares one schema).  All levels must
    define the same QI names.  Returns ``(id_col, *qi_cols,
    anon_level int, suppressed boolean)``; suppressed rows carry
    ``anon_level = len(ladder)`` and NULL QIs.

    ``materialize`` (default True) localCheckpoints each level's
    counted frame (the dsir_select rule): the emit branch and the
    escalation branch both consume it, and a lazy plan would otherwise
    recompute every upstream level's window per output branch — 5
    exchanges + 3 scans for a 2-level ladder instead of 2 + 1 (plan-
    audited).  Pass False for a fully lazy plan (plan tests).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2 for any grouping guarantee, got {k}")
    if not ladder:
        raise ValueError("ladder must have at least one level")
    qi_cols = list(ladder[0].keys())
    for lvl, gens in enumerate(ladder):
        if list(gens.keys()) != qi_cols:
            raise ValueError(
                f"ladder level {lvl} defines QIs {list(gens.keys())}, "
                f"expected {qi_cols} (all levels must match level 0)"
            )
    work = {"anon_level", "suppressed", "__n"} | {
        f"__qi_{c}" for c in qi_cols
    }
    clash = work & set(df.columns)
    if clash:
        raise ValueError(f"output/work columns already exist: {sorted(clash)}")

    remaining = df
    emitted: list[DataFrame] = []
    for lvl, gens in enumerate(ladder):
        g = remaining.select(
            "*",
            *[v.cast("string").alias(f"__qi_{c}") for c, v in gens.items()],
        )
        w = Window.partitionBy(*[f"__qi_{c}" for c in qi_cols])
        counted = g.withColumn("__n", F.count(F.lit(1)).over(w))
        if materialize:
            counted = counted.localCheckpoint(eager=True)
        emitted.append(
            counted.filter(F.col("__n") >= k).select(
                id_col,
                *[F.col(f"__qi_{c}").alias(c) for c in qi_cols],
                F.lit(lvl).cast("int").alias("anon_level"),
                F.lit(False).alias("suppressed"),
            )
        )
        remaining = counted.filter(F.col("__n") < k).select(df.columns)
    emitted.append(
        remaining.select(
            id_col,
            *[F.lit(None).cast("string").alias(c) for c in qi_cols],
            F.lit(len(ladder)).cast("int").alias("anon_level"),
            F.lit(True).alias("suppressed"),
        )
    )
    return reduce(DataFrame.unionByName, emitted)
