"""Config -> DataFrame plan compiler (SURVEY.md L1/L2, §3.1).

Reproduces the reference's map/reduce semantics
(``impl/mapreduce/v0.py:28-70``): each instruction scope-projects the record,
a system prompt templated from the instruction frames the task
(``instructions.py:71-95``), the LLM's answer lands in a column named after
the instruction, the reduce stage reads *those* columns, and the final result
is a markdown report of the last stage plus full ChatML lineage.

Everything except the completion itself is a Column expression, so the
whole pipeline is one narrow Spark job: scan -> per-instruction expressions
-> (kernel) -> select. No shuffle anywhere — map and reduce operate on the
same row, which the reference's design guarantees (the reduce consumes the
map outputs of the *same record*).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from instructionspipe_spark.functions.chatml import chatml, msg
from instructionspipe_spark.functions.nulls import is_valid
from instructionspipe_spark.functions.strkv import stringify
from instructionspipe_spark.plans.instructions import Instruction, Pipeline
from instructionspipe_spark.plans.llm_kernel import LlmClient, MockLlm

# Section order mirrors the reference's instruction_to_sys_prompt
# (instructions.py:71-95): Role / Task / Given Input / Expected Output /
# Output Format / External Knowledge / Examples.
_SECTIONS: tuple[tuple[str, str], ...] = (
    ("role", "## Role"),
    ("content", "## Task"),
    ("input_desc", "## Given Input"),
    ("output_desc", "## Expected Output"),
    ("output_fmt", "## Output Format"),
)


def system_prompt(instr: Instruction) -> str:
    """Deterministic system prompt text for an instruction. Constant per
    instruction — byte-identical across all rows, which is what keeps
    server-side prefix caching effective (reference README.md:85)."""
    parts: list[str] = []
    for attr, header in _SECTIONS:
        val = getattr(instr, attr)
        if val:
            parts.append(f"{header}\n{val}")
    for header, vals in (("## External Knowledge", instr.knowledge), ("## Examples", instr.examples)):
        if vals:
            parts.append(header + "\n" + "\n".join(vals))
    return "\n\n".join(parts)


def user_message(df: DataFrame, scope: tuple[str, ...]) -> Column:
    """Scope projection serialized as ``# field\\nvalue`` markdown, dropping
    semantic-null fields (build_inputs, instructions_runners.py:42-61)."""
    sections = []
    for name in scope:
        if name not in df.columns:
            continue
        body = stringify(df, name)
        sections.append(F.when(is_valid(F.col(name)), F.concat(F.lit(f"# {name}\n"), body)))
    if not sections:
        return F.lit("")
    return F.concat_ws("\n\n", *sections)


def build_prompt(df: DataFrame, instr: Instruction) -> Column:
    """Full prompt: system prompt + blank line + scope markdown."""
    return F.concat(F.lit(system_prompt(instr)), F.lit("\n\n"), user_message(df, instr.scope))


def _resolve(llm: LlmClient | dict[str, LlmClient], instr: Instruction) -> LlmClient:
    """Multi-model routing (L3): per-instruction ``model`` picks the client
    from a dict keyed by model name (reference instructions_runners.py:83-86)."""
    if isinstance(llm, dict):
        if instr.model is not None:
            return llm[instr.model]
        return next(iter(llm.values()))
    return llm


def run_stage(
    df: DataFrame,
    instructions: tuple[Instruction, ...],
    llm: LlmClient | dict[str, LlmClient] = MockLlm(),
    lineage: bool = False,
) -> DataFrame:
    """One map-or-reduce stage: adds a column per instruction name with the
    completion; with ``lineage=True`` also adds ``<name>__msgs`` ChatML.

    Empty scopes / all-null scopes yield an empty user message; the empty-
    instruction predicate (P6) nulls the completion instead of calling the
    model.
    """
    out = df
    for instr in instructions:
        client = _resolve(llm, instr)
        sys_text = system_prompt(instr)
        umsg_col = f"__umsg_{instr.name}"
        # P6 empty-instruction predicate: no scoped input content -> no
        # model call (reference llm_cli.py:91-99). Guard on the USER
        # message — the system prompt is constant and would defeat the
        # check (and trim() does not strip newlines). The guarded column is
        # exactly the user message SENT: wire clients post it as its own
        # user-roled turn next to the system message (llm_cli.py:114);
        # expression clients hash the canonical system+"\n\n"+user concat
        # (NULL user propagates through concat, so the guard holds there too).
        umsg = user_message(df, instr.scope)
        out = out.withColumn(umsg_col, F.when(F.length(umsg) > 0, umsg))
        out = client.complete_df(out, umsg_col, instr.name, system=sys_text)
        if lineage:
            out = out.withColumn(
                f"{instr.name}__msgs",
                chatml(
                    msg("system", F.lit(sys_text)),
                    msg("user", F.col(umsg_col)),
                    msg("assistant", F.col(instr.name)),
                ),
            )
        out = out.drop(umsg_col)
    return out


def final_markdown(instructions: tuple[Instruction, ...]) -> Column:
    """instructions_to_md (F3): ``# name\\ncompletion`` sections of the last
    stage, skipping instructions that produced nothing."""
    parts = [
        F.when(F.col(i.name).isNotNull(), F.concat(F.lit(f"# {i.name}\n"), F.col(i.name)))
        for i in instructions
    ]
    return F.concat_ws("\n\n", *parts)


def run_pipeline(
    df: DataFrame,
    pipeline: Pipeline,
    llm: LlmClient | dict[str, LlmClient] = MockLlm(),
    lineage: bool = False,
    result_col: str = "result",
    session_col: str = "session_id",
) -> DataFrame:
    """Run all stages and add the final markdown ``result`` plus a
    content-addressed ``session_id`` (deterministic replacement for the
    reference's uuid lineage stamp, v0.py:54-60)."""
    out = df
    for stage in pipeline.stages:
        out = run_stage(out, stage, llm, lineage=lineage)
    last = pipeline.stages[-1]
    out = out.withColumn(result_col, final_markdown(last))
    out = out.withColumn(
        session_col, F.sha2(F.to_json(F.struct(*[F.col(c) for c in df.columns])), 256)
    )
    return out
