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


def grouped_topk(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    id_col: str,
    k: int,
    num_salts: int = 16,
) -> DataFrame:
    """EXACT top-``k`` rows per key group, ordered by ``order_col``
    descending with ``id_col`` ascending as the total-order tie-break —
    WITHOUT a window.  ``row_number() OVER (PARTITION BY key ...)``
    sorts each key's entire group in ONE task: a hot key (the
    dominant-language / null-bucket shape) pins a straggler exactly
    like the pre-round-8 ``lm_buckets`` ntile did.

    Two-phase salted aggregation instead:

    1. group by (keys, ``xxhash64(id) % num_salts``) and keep each
       salt's LOCAL top-k (``array_sort`` + ``slice`` over the
       collected items) — the hot key's rows spread across
       ``num_salts`` independent reducers, each holding
       O(group/num_salts) items transiently and emitting ≤ k;
    2. group by keys alone and merge the ≤ ``num_salts·k`` partials —
       bounded regardless of group size.

    Exact by the pigeonhole: every global top-k row is in its own
    salt's top-k.  Map-side partial aggregation applies to both
    phases (unlike any window).  The sort uses an explicit comparator
    over (order, id) only, so payload columns need not be orderable
    (maps/arrays ride along untouched); ``order_col`` compares as
    DOUBLE with NULL ranking last, and ties beyond (order, id) cannot
    exist since ``id_col`` is unique per row.
    """
    cols = df.columns
    item = F.struct(
        F.coalesce(F.col(order_col).cast("double"), F.lit(float("-inf")))
        .alias("__o"),
        F.col(id_col).alias("__t"),
        F.struct(*cols).alias("__r"),
    )

    def _cmp(a, b):  # descending __o, ascending __t
        return (
            F.when(a["__o"] > b["__o"], F.lit(-1))
            .when(a["__o"] < b["__o"], F.lit(1))
            .when(a["__t"] < b["__t"], F.lit(-1))
            .when(a["__t"] > b["__t"], F.lit(1))
            .otherwise(F.lit(0))
        )

    def _topk(arr):
        return F.slice(F.array_sort(arr, _cmp), 1, k)

    salted = df.groupBy(
        *keys, F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_salts)).alias("__s")
    ).agg(_topk(F.collect_list(item)).alias("__a"))
    merged = salted.groupBy(*keys).agg(
        _topk(F.flatten(F.collect_list("__a"))).alias("__a")
    )
    return merged.select(F.explode("__a").alias("__e")).select("__e.__r.*")
