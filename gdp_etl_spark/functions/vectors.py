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
