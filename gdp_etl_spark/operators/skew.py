"""Skew-mitigation join (salting).

AQE's skew-join splitting handles most skew at runtime, but when one
join key dominates (the classic hot-customer / null-key case) the
deterministic fix is salting: spread the hot key's rows over
``num_salts`` sub-keys and replicate the other side once per salt.
Shuffle volume grows by ``num_salts × |small side|`` and the hot
partition shrinks by ``num_salts×`` — the right trade whenever one
partition would otherwise exceed executor memory.

Result equivalence: a salted equi-join is row-for-row identical to the
plain join (tested); only the physical partitioning changes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the ``skewed`` side's rows are spread over
    ``num_salts`` salt buckets and ``other`` is replicated per salt.

    The salt is a deterministic hash of the skewed side's full row, so
    rows sharing a hot key still scatter across buckets while the same
    input always produces the same partitioning (replayable plans).
    """
    salt = F.pmod(
        F.xxhash64(F.struct(*[F.col(c) for c in skewed.columns])), F.lit(num_salts)
    ).cast("int")
    left = skewed.withColumn("__salt", salt)
    right = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return left.join(right, [*on, "__salt"], how).drop("__salt")
