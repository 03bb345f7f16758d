"""Point-in-interval (range) join with bucketed banding.

The naive plan for ``points ⋈ intervals ON p BETWEEN lo AND hi`` is a
broadcast-nested-loop or cartesian scan — the classic non-equi-join
scale killer.  The banded plan turns it into an equi-join:

1. pick a band width ``w`` (≈ median interval length),
2. each interval explodes to every band it overlaps
   (``floor(lo/w) .. floor(hi/w)`` — short intervals hit 1-2 bands),
3. each point maps to exactly one band,
4. equi-join on the band key, then the exact BETWEEN filter.

Shuffle volume: |points| + Σ interval band counts — linear, partitioned
by band, AQE-splittable on hot bands.  Works for any orderable numeric
domain; timestamps are joined via ``unix_micros``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    band_width: int,
    keys: tuple = (),
    how: str = "inner",
) -> DataFrame:
    """Join every point row to the interval rows containing it
    (``lo <= p <= hi``), via banding on ``band_width``-sized buckets of
    the shared numeric domain; ``keys`` adds ordinary equi-join columns
    (e.g. a user id) to the band key so unrelated groups never collide.
    ``how="left"`` keeps matchless point rows with NULL interval
    columns."""
    p_band = F.floor(F.col(point_col) / F.lit(band_width))
    pts = points.withColumn("__band", p_band)

    iv = intervals.withColumn(
        "__band",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(band_width)),
                F.floor(F.col(hi_col) / F.lit(band_width)),
            )
        ),
    )
    joined = pts.join(iv, ["__band", *keys], "inner").filter(
        F.col(point_col).between(F.col(lo_col), F.col(hi_col))
    )
    if how == "inner":
        return joined.drop("__band")
    if how == "left":
        matched = joined.drop("__band")
        matched_keys = matched.select(*points.columns).distinct()
        missing = points.join(matched_keys, points.columns, "left_anti")
        return matched.unionByName(missing, allowMissingColumns=True)
    raise ValueError(f"unsupported how={how!r}")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    band_width: int,
    keys: tuple = (),
) -> DataFrame:
    """Interval×interval overlap join (half-open: ``l_lo < r_hi AND
    r_lo < l_hi``) as a pure equi-join — the two-sided sibling of
    :func:`point_in_interval_join`.

    Both sides explode onto ``band_width`` buckets of the shared
    numeric domain and equi-join on the bucket (+ ``keys``).  A pair of
    intervals overlapping ``k`` shared buckets would surface ``k``
    times; instead of a ``distinct`` over the (wide) pair output, each
    pair is emitted ONLY from the bucket containing ``max(l_lo, r_lo)``
    — the first bucket the overlap occupies, which both sides
    provably explode into.  Dedup is a per-row predicate, zero extra
    shuffle.

    Shuffle volume is Σ band counts of both sides, partitioned by
    (keys, band) — linear, AQE-splittable, never quadratic; at 100 TB
    pick ``band_width`` ≈ the median interval length so short intervals
    explode into 1-2 buckets.
    """
    w = F.lit(band_width)
    lt = left.withColumn(
        "__band",
        F.explode(
            F.sequence(
                F.floor(F.col(l_lo) / w), F.floor(F.col(l_hi) / w)
            )
        ),
    )
    rt = right.withColumn(
        "__band",
        F.explode(
            F.sequence(
                F.floor(F.col(r_lo) / w), F.floor(F.col(r_hi) / w)
            )
        ),
    )
    cond = [lt["__band"] == rt["__band"]] + [
        lt[k] == rt[k] for k in keys
    ]
    # frame-qualified references: the bound columns may share names
    # across the two sides ("lo"/"hi" on both is the natural call) —
    # unqualified F.col would be ambiguous after the join
    overlap = (lt[l_lo] < rt[r_hi]) & (rt[r_lo] < lt[l_hi])
    first_band = F.floor(F.greatest(lt[l_lo], rt[r_lo]) / w)
    out = (
        lt.join(rt, cond)
        .filter(overlap & (lt["__band"] == first_band))
        .drop("__band")
    )
    # keys survive once (identical on both sides)
    for k in keys:
        out = out.drop(rt[k])
    return out
