"""ChatML column type and transforms (SURVEY.md F9-F12).

ChatML is first-class data in the reference (per-instruction message lists,
training columns — ``instructions.py:38``, ``demo_data/training/*.jsonl``).
Here it is a typed nested column ``ARRAY<STRUCT<role,content>>`` manipulated
with array expressions — ``transform``/``concat``/``element_at`` — never UDFs,
so ChatML flows through joins, dedup and streaming like any other column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHATML_TYPE = T.ArrayType(
    T.StructType(
        [T.StructField("role", T.StringType()), T.StructField("content", T.StringType())]
    )
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def msg(role: str, content: Column | str) -> Column:
    """One ChatML message struct from a role literal and a content column
    (pass a Column; a plain string is treated as a column name)."""
    return F.struct(F.lit(role).alias("role"), _c(content).cast("string").alias("content"))


def chatml(*messages: Column) -> Column:
    """Build a ChatML array column from message structs (json2chatml,
    reference ``apps/tools/run_single_round_chat.py:17-28``)."""
    return F.array(*messages)


#: Package-root alias (the bare name would shadow this module when
#: re-exported from functions/__init__.py).
make_chatml = chatml


def last_content(col: Column | str) -> Column:
    """Content of the final message — the reference's ``result[name] =
    msgs[-1].content`` convention (instructions_runners.py:149-158)."""
    return F.element_at(_c(col), -1)["content"]


def chatml_to_text(col: Column | str) -> Column:
    """Flatten ChatML to ``<role>content</role>`` text
    (reference ``apps/training/grpo_plugin.py:168-178``)."""
    parts = F.transform(
        _c(col),
        lambda m: F.concat(F.lit("<"), m["role"], F.lit(">"), F.coalesce(m["content"], F.lit("")), F.lit("</"), m["role"], F.lit(">")),
    )
    return F.array_join(parts, "")


def chatml_adjust_for_family(col: Column | str, family: str) -> Column:
    """Model-family ChatML rewrite (reference ``apps/training/sft.py:54-75``):
    for families without a system role (mistral/gemma), demote system->user
    and splice an ``{"assistant", "Ok."}`` acknowledgement after it; always
    coalesce NULL content to "".
    """
    c = _c(col)
    cleaned = F.transform(
        c,
        lambda m: F.struct(m["role"].alias("role"), F.coalesce(m["content"], F.lit("")).alias("content")),
    )
    if family.lower() not in {"mistral", "gemma"}:
        return cleaned
    head = F.slice(cleaned, 1, 1)
    rest = F.when(F.size(cleaned) > 1, F.slice(cleaned, 2, F.size(cleaned) - 1)).otherwise(
        F.array().cast(CHATML_TYPE)
    )
    demoted_head = F.transform(
        head,
        lambda m: F.struct(
            F.when(m["role"] == "system", F.lit("user")).otherwise(m["role"]).alias("role"),
            m["content"].alias("content"),
        ),
    )
    ack = F.array(F.struct(F.lit("assistant").alias("role"), F.lit("Ok.").alias("content")))
    has_system = F.element_at(c, 1)["role"] == "system"
    return F.when(has_system, F.concat(demoted_head, ack, rest)).otherwise(cleaned)
