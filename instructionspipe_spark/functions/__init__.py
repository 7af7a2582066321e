"""Scalar-function surface (SURVEY.md §2.8) — expressions, not UDFs.

Every function here returns a ``pyspark.sql.Column`` built from built-in
functions, so it stays inside whole-stage codegen and is usable in streaming
and batch alike. Python UDFs are deliberately absent from this package.
"""

from instructionspipe_spark.functions.nulls import (  # noqa: F401
    INVALID_VALS,
    is_semantic_null,
    is_valid,
    nullify_invalid,
)
from instructionspipe_spark.functions.strkv import (  # noqa: F401
    kv_markdown,
    sections_markdown,
    stringify,
)
from instructionspipe_spark.functions.text import (  # noqa: F401
    cache_key,
    char_ngrams,
    fence_strip,
    redact,
    redaction_count,
    tag_extract,
    template_fill,
    whitespace_tokens,
    word_count,
)
from instructionspipe_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
)
# NB: the submodule is deliberately NOT shadowed — re-exporting the
# ``chatml`` builder function here would replace the package attribute
# ``functions.chatml`` (the module) with the function, breaking
# ``import instructionspipe_spark.functions.chatml as cm``. Use
# ``make_chatml`` from the package root, or import from the submodule.
from instructionspipe_spark.functions.chatml import (  # noqa: F401
    CHATML_TYPE,
    chatml_adjust_for_family,
    chatml_to_text,
    last_content,
    make_chatml,
    msg,
)
