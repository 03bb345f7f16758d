"""Vector expressions over embedding columns (``array<float>``).

The built-in higher-order functions (``zip_with`` + ``aggregate``) keep
dot products JVM-side and codegen-compiled — right for per-row scoring
inside a larger plan.  For bulk top-k over millions of vectors the
Arrow-batched numpy path in ``operators/similarity.py`` wins (BLAS matrix
multiply per batch); both produce identical neighbour sets.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ in double precision (sequential fold → deterministic)."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL if either vector has zero norm."""
    na, nb = norm(a), norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(None).cast("double")).otherwise(
        dot(a, b) / (na * nb)
    )


# --------------------------------------------------------------------------
# fixed-point variants — bit-reproducible across engines and partitionings
# --------------------------------------------------------------------------
#: fixed-point scale: 12 fractional digits.  Unit-ish embedding products
#: stay < ~1e3, so scaled elements < 1e15 < 2^53 (exact in the double
#: before the floor) and a 4096-dim sum < 2^63 (exact in bigint).
_FP_SCALE = 1e12


def dot_fixed(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ via fixed-point: each product is floored to 12 decimals and
    accumulated as an exact bigint sum.  Double summation is
    order-dependent; integer accumulation makes the result independent of
    partitioning AND identical in any engine following the same recipe
    (the DuckDB oracle mirrors it as
    ``list_sum(list_transform(..., floor(x*y*1e12)::bigint)) / 1e12``)."""
    prods = F.zip_with(
        _to_double(a), _to_double(b), lambda x, y: F.floor(x * y * F.lit(_FP_SCALE))
    )
    return (
        F.aggregate(prods, F.lit(0).cast("bigint"), lambda acc, x: acc + x).cast("double")
        / F.lit(_FP_SCALE)
    )


def cosine_exact(a: Column, b: Column) -> Column:
    """Cross-engine-deterministic cosine: fixed-point dot products, one
    final double sqrt/divide; NULL if either norm is zero."""
    na2, nb2 = dot_fixed(a, a), dot_fixed(b, b)
    return F.when((na2 <= 0) | (nb2 <= 0), F.lit(None).cast("double")).otherwise(
        dot_fixed(a, b) / (F.sqrt(na2) * F.sqrt(nb2))
    )
