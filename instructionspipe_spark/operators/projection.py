"""Scope projection — the reference's signature operator (SURVEY.md P1).

The reference prunes each record to the fields named in
``instruction.scope`` and drops semantic-null values before serializing the
rest as the LLM user message (``instructions_runners.py:42-61`` build_inputs,
scope declared at ``instructions.py:36``). Here scope compiles to a plain
``select`` — which means Catalyst propagates the pruning all the way into the
parquet scan (ReadSchema), the single biggest I/O win at 100 TB — and the
markdown serialization is a ``concat_ws`` expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from instructionspipe_spark.functions.nulls import nullify_invalid
from instructionspipe_spark.functions.strkv import kv_markdown


def scope_project(df: DataFrame, scope: list[str], keep: list[str] | None = None) -> DataFrame:
    """Keep only the scope columns (plus optional passthrough ``keep`` cols,
    the reference's extra_cols P3), with semantic nulls canonicalized to NULL.
    Unknown scope names are ignored, matching the reference's dict.get."""
    cols: list[Column] = []
    present = set(df.columns)
    for name in keep or []:
        if name in present:
            cols.append(df[name])
    for name in scope:
        if name in present and name not in (keep or []):
            cols.append(nullify_invalid(df[name]).alias(name))
    return df.select(*cols)


def scope_markdown(df: DataFrame, scope: list[str], out_col: str = "input_md") -> DataFrame:
    """Scope projection rendered as the ``# field\\nvalue`` markdown the
    reference feeds the LLM, added as a column."""
    present = [c for c in scope if c in df.columns]
    return df.withColumn(out_col, kv_markdown(df, present))


def parse_markdown_sections(df: DataFrame, text_col: str, keep: list[str] | None = None) -> DataFrame:
    """Inverse of ``kv_markdown``: explode a ``# header\\nbody`` markdown
    document into one row per section via a Python UDTF (§2.11 — the
    engine's user-facing table-function surface; the reference's analog is
    its ad-hoc generated-pandas table functions, SURVEY.md §2.11).

    UDTFs are the slow path (row-at-a-time Python); this one exists for the
    config-driven cases a Column expression can't express — known-shape
    parses belong in expressions. Output: ``keep`` passthrough columns +
    (section_idx, header, body). Registered and applied as a SQL LATERAL
    join, so Catalyst still prunes the passthrough columns."""
    from pyspark.sql.functions import udtf

    spark = df.sparkSession

    @udtf(returnType="section_idx int, header string, body string")
    class ParseMarkdownSections:
        def eval(self, text: str):  # noqa: ANN001
            if text is None:
                return
            idx = 0
            header, body = None, []
            for line in text.split("\n"):
                if line.startswith("# "):
                    if header is not None:
                        yield idx, header, "\n".join(body).strip()
                        idx += 1
                    header, body = line[2:], []
                elif header is not None:
                    body.append(line)
            if header is not None:
                yield idx, header, "\n".join(body).strip()

    spark.udtf.register("parse_markdown_sections", ParseMarkdownSections)
    cols = ", ".join(f"t.`{c}`" for c in (keep or []))
    prefix = f"{cols}, " if cols else ""
    df.createOrReplaceTempView("__md_sections_in")
    return spark.sql(
        f"SELECT {prefix}s.section_idx, s.header, s.body "
        f"FROM __md_sections_in t, LATERAL parse_markdown_sections(t.`{text_col}`) s"
    )
