"""Text scalar functions (SURVEY.md F5-F7, F13-F15) as pure expressions.

Covers the reference's template substitution
(``apps/llm_as_a_judge/eval_with_facts.py:534-542``), tag extraction
(``apps/poc-codaact-tableqa/tableqa_codeact.py:117-134``), code-fence
stripping (``eval_with_facts.py:558-561``), char n-grams with punctuation
strip (``apps/etl/etl_slimpajama_dc_proc.py:41-55``), word count
(``etl_slimpajama_dc_proc.py:142``) and the sha256 cache key
(``src/python/instructionspipe/llm_cli.py:101-104``).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def template_fill(template: str, mapping: dict[str, Column | str]) -> Column:
    """``__PLACEHOLDER__`` substitution: build a Column from a literal template
    with each placeholder spliced from a Column. Placeholders must each occur
    exactly once (the reference uses str.replace with single occurrences)."""
    # Split the template on placeholders, interleave literals and columns.
    if not mapping:
        return F.lit(template)
    pattern = "(" + "|".join(re.escape(k) for k in mapping) + ")"
    parts = re.split(pattern, template)
    cols: list[Column] = []
    for part in parts:
        if part in mapping:
            cols.append(F.coalesce(_c(mapping[part]).cast("string"), F.lit("")))
        elif part:
            cols.append(F.lit(part))
    return F.concat(*cols) if len(cols) > 1 else cols[0]


def tag_extract(col: Column | str, open_tag: str, close_tag: str) -> Column:
    """Extract text between a tag pair; NULL when absent (the reference walks
    a fallback list of tag pairs — compose with ``coalesce``)."""
    pat = re.escape(open_tag) + r"([\s\S]*?)" + re.escape(close_tag)
    out = F.regexp_extract(_c(col), pat, 1)
    return F.when(out != "", out)


def fence_strip(col: Column | str) -> Column:
    """Strip ```json / ``` fences and a leading reasoning block ending in
    </think> — llm_json_clean semantics."""
    c = _c(col)
    c = F.element_at(F.split(c, "</think>"), -1)
    c = F.regexp_replace(c, r"^\s*```(?:json|python)?\s*", "")
    c = F.regexp_replace(c, r"\s*```\s*$", "")
    return F.trim(c)


def whitespace_tokens(col: Column | str) -> Column:
    """Split into whitespace tokens, dropping empties."""
    return F.filter(F.split(_c(col), r"\s+"), lambda t: t != "")


def word_count(col: Column | str) -> Column:
    """Whitespace word count (reference counts ``split(' ')`` after newline
    replacement; we count non-empty tokens, which is strictly better and what
    its low-length filter intends)."""
    return F.size(whitespace_tokens(col))


def shingle_normalize(col: Column | str) -> Column:
    """Shingling normalization: strip punctuation, lowercase, collapse
    whitespace. The single source of truth shared by the expression shingler
    (``char_ngrams``) and the Arrow shingle kernels in ``operators.dedup`` —
    it runs JVM-side in both paths, so Java-vs-Python regex semantics can
    never drift between them.

    Unicode letter/number classes, not ``\\w``: Java ``\\w`` is ASCII-only and
    would strip ALL non-Latin text, leaving empty shingle sets for
    non-English documents. ``\\p{L}\\p{N}`` works identically in Java regex
    (Spark) and RE2 (DuckDB oracle)."""
    c = F.lower(F.regexp_replace(_c(col), r"[^\p{L}\p{N}\s]", ""))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def char_ngrams(col: Column | str, n: int = 3, strip_punct: bool = True) -> Column:
    """Character n-gram array after (optionally) stripping punctuation and
    collapsing whitespace — the shingle set for MinHash / Jaccard dedup.

    Pure expression: sequence + transform over substrings, so it runs
    JVM-side and streams. Returns an empty array for short strings.
    """
    c = _c(col)
    if strip_punct:
        c = shingle_normalize(c)
    length = F.length(c)
    text = c
    # Guard: sequence(1, 0) would produce a DESCENDING [1, 0], not empty —
    # texts shorter than n must yield an empty shingle set.
    return F.when(
        length >= n,
        F.transform(
            F.sequence(F.lit(1), length - F.lit(n - 1)), lambda i: text.substr(i, F.lit(n))
        ),
    ).otherwise(F.array().cast("array<string>"))


#: Default redaction patterns: the PII-ish trio a corpus-prep pipeline
#: scrubs before anything else sees the text. Each regex works identically
#: in Java regex (Spark) and RE2 (the DuckDB oracle).
REDACTION_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"[0-9]+", "<NUM>"),
)


def redact(col: Column | str, patterns=REDACTION_PATTERNS) -> Column:
    """Replace every match of each ``(regex, token)`` pair, applied in
    order. Pure expression (chained ``regexp_replace``) — streams through
    codegen, no shuffle, no Python."""
    c = _c(col)
    for pat, token in patterns:
        c = F.regexp_replace(c, pat, token)
    return c


def redaction_count(col: Column | str, patterns=REDACTION_PATTERNS) -> Column:
    """Total number of matches the same ``patterns`` would redact — the
    audit metric beside :func:`redact`. Counted on the ORIGINAL text, so
    overlapping replacement tokens never double-count."""
    c = _c(col)
    total = F.lit(0).cast("bigint")
    for pat, _ in patterns:
        total = total + F.regexp_count(c, F.lit(pat)).cast("bigint")
    return total


def cache_key(col: Column | str) -> Column:
    """sha256 hex digest of a string column — the LLM response-cache key
    (reference hashes json.dumps(chatml); we hash the canonical prompt)."""
    return F.sha2(_c(col), 256)
