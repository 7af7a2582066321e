"""Semantic-null predicate (SURVEY.md P2).

The reference treats a fixed set of strings as "no value" and drops those
fields before prompting (reference ``src/python/instructionspipe/constants.py:9-20``,
used at ``instructions_runners.py:51``). Here that convention is a reusable
Column predicate so Catalyst can push it into scans and prune columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Same semantic-null set as the reference's INVALID_VALS (constants.py:12-20),
# minus the literal None which SQL models as NULL.
INVALID_VALS: tuple[str, ...] = ("   ", "", " ", "NA", "N/A", "\n")


def is_semantic_null(col: Column | str) -> Column:
    """True when the value is NULL or one of the semantic-null strings."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNull() | c.cast("string").isin(*INVALID_VALS)


def is_valid(col: Column | str) -> Column:
    """Negation of :func:`is_semantic_null` (NULL-safe: NULL -> False)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & ~c.cast("string").isin(*INVALID_VALS)


def nullify_invalid(col: Column | str) -> Column:
    """Map semantic nulls to real NULLs (canonicalization before grouping)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(is_valid(c), c)
