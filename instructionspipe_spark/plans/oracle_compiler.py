"""DuckDB-oracle SQL generator for the MockLlm instruction pipeline.

Mirrors :mod:`instructionspipe_spark.plans.compiler` construct-for-construct:
the same ``Pipeline`` object that compiles to the Spark plan also compiles to
an ANSI SQL string, so the differential harness checks the *whole pipeline
semantics* (scope projection -> semantic-null dropping -> prompt templating
-> deterministic completion -> reduce -> markdown report), not a re-coded
approximation. Any drift between the two compilers is a test failure, which
is the point.
"""

from __future__ import annotations

from instructionspipe_spark.functions.nulls import INVALID_VALS
from instructionspipe_spark.plans.compiler import system_prompt
from instructionspipe_spark.plans.instructions import Instruction, Pipeline

_NL2 = "chr(10) || chr(10)"


def sql_str(s: str) -> str:
    """SQL expression producing exactly the Python string ``s`` (newlines via
    chr(10) so no dialect escape rules apply)."""
    quoted = s.replace("'", "''").replace("\n", "' || chr(10) || '")
    return f"'{quoted}'"


def _invalid_list() -> str:
    vals = ", ".join("chr(10)" if v == "\n" else "'" + v.replace("'", "''") + "'" for v in INVALID_VALS)
    return vals


def valid_sql(col: str) -> str:
    """SQL mirror of functions.nulls.is_valid."""
    return f"({col} IS NOT NULL AND CAST({col} AS VARCHAR) NOT IN ({_invalid_list()}))"


def user_message_sql(scope: tuple[str, ...], available: set[str]) -> str:
    """SQL mirror of compiler.user_message (concat_ws skips NULL sections in
    both engines)."""
    sections = []
    for name in scope:
        if name not in available:
            continue
        sections.append(
            f"CASE WHEN {valid_sql(name)} THEN {sql_str(f'# {name}')} || chr(10) || CAST({name} AS VARCHAR) END"
        )
    if not sections:
        return "''"
    return f"concat_ws({_NL2}, " + ", ".join(sections) + ")"


def completion_sql(instr: Instruction, available: set[str], model: str = "mock") -> str:
    """SQL mirror of MockLlm.completion_column over build_prompt, including
    the P6 empty-instruction guard (NULL completion when the scoped user
    message is empty — compiler.run_stage)."""
    umsg = user_message_sql(instr.scope, available)
    prompt = f"{sql_str(system_prompt(instr))} || {_NL2} || ({umsg})"
    return f"CASE WHEN length({umsg}) > 0 THEN md5({sql_str(model + ':')} || ({prompt})) END"


def pipeline_sql(
    pipeline: Pipeline,
    table: str,
    id_col: str,
    input_cols: tuple[str, ...],
    result_col: str = "result",
) -> str:
    """Full oracle SQL for run_pipeline (minus session_id, which is
    JSON-serialization-dependent and checked separately in unit tests):
    one CTE per stage, final projection of id, per-instruction outputs of
    every stage, and the markdown report column."""
    available = set(input_cols)
    prev = table
    ctes = []
    carried: list[str] = [id_col, *input_cols]
    for si, stage in enumerate(pipeline.stages):
        outs = ", ".join(
            f"{completion_sql(instr, available)} AS {instr.name}" for instr in stage
        )
        keep = ", ".join(carried)
        ctes.append(f"stage{si} AS (SELECT {keep}, {outs} FROM {prev})")
        prev = f"stage{si}"
        available = {i.name for i in stage}
        carried = carried + [i.name for i in stage]
    last = pipeline.stages[-1]
    md_sections = ", ".join(
        f"CASE WHEN {i.name} IS NOT NULL THEN {sql_str(f'# {i.name}')} || chr(10) || {i.name} END"
        for i in last
    )
    out_cols = [id_col] + [i.name for st in pipeline.stages for i in st]
    select_cols = ", ".join(out_cols)
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT {select_cols}, "
        f"concat_ws({_NL2}, {md_sections}) AS {result_col} FROM {prev}"
    )
