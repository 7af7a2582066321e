"""Vector math over ``array<float|double>`` columns as pure expressions.

The scale path for similarity search (north-star requirement): dot product /
cosine via ``zip_with`` + ``aggregate`` stay JVM-side and vectorize under
whole-stage codegen — no Python in the hot loop. Accumulation is sequential
left-to-right in DOUBLE, which makes results deterministic and reproducible
in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sequential-ordered double-precision dot product of two array columns."""
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot_product(a, b) / (na * nb))


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalized copy of the vector; NULL for zero-norm vectors.

    For pairwise similarity (joins), normalize each side ONCE per row and
    take plain dot products per pair — O(rows x dim) instead of
    O(pairs x dim) norm recomputation. The norm is let-bound via a 1-element
    array so it is evaluated once per row, not once per element."""
    v = _c(a)
    return F.element_at(
        F.transform(
            F.array(l2_norm(v)),
            lambda n: F.when(n > 0, F.transform(v, lambda x: x.cast("double") / n)),
        ),
        1,
    )
