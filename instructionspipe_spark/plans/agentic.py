"""Agentic map/reduce (SURVEY.md L11): supervisor fan-out as dataflow.

The reference builds a LangGraph supervisor that ``Send``s one message per
instruction to task-typed agent nodes and merges their dict outputs
(``src/python/instructionspipe/impl/agentic_mr/v0.py:116-158``). That graph
is control-flow around a fixed dataflow; here it IS the dataflow:

    records × instructions  -> explode            (fan-out)
    route by ``task``       -> per-task kernel    (agent nodes)
    groupBy(record)         -> map_from_entries   (state merge)

The explode multiplies rows, not bytes-of-state (each fanned row carries only
the record key + the scoped input), and the merge is one shuffle on the
record key. Task kernels are registered in a dict — the engine's UDF registry
(SURVEY.md §2.11) — defaulting to the standard instruction kernel.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from instructionspipe_spark.plans.compiler import run_stage
from instructionspipe_spark.plans.instructions import Instruction
from instructionspipe_spark.plans.llm_kernel import LlmClient, MockLlm

#: A task kernel takes (df, instructions, llm) and adds one output column per
#: instruction name — the same contract as run_stage, which is the default.
TaskKernel = Callable[[DataFrame, tuple[Instruction, ...], LlmClient], DataFrame]


def default_kernel(df: DataFrame, instructions: tuple[Instruction, ...], llm) -> DataFrame:
    return run_stage(df, instructions, llm)


def agentic_map(
    df: DataFrame,
    instructions: tuple[Instruction, ...],
    llm: LlmClient | dict[str, LlmClient] = MockLlm(),
    kernels: dict[str, TaskKernel] | None = None,
    task_of: Callable[[Instruction], str] | None = None,
    id_col: str = "doc_id",
    out_col: str = "agent_results",
) -> DataFrame:
    """Supervisor fan-out: run each instruction through the kernel registered
    for its task, merge results into a ``map<name, completion>`` per record.

    ``task_of`` maps an instruction to its task/agent type (reference
    ``AgentMeta.name``); unknown tasks fall back to the default kernel.
    Instructions sharing a kernel run as ONE stage (no per-instruction job),
    so the physical plan is |distinct kernels| column-append stages + one
    groupBy(id) merge.
    """
    kernels = kernels or {}
    task_of = task_of or (lambda i: "default")

    by_task: dict[str, list[Instruction]] = {}
    for instr in instructions:
        by_task.setdefault(task_of(instr), []).append(instr)

    out = df
    for task, instrs in by_task.items():
        kernel = kernels.get(task, default_kernel)
        out = kernel(out, tuple(instrs), llm)

    entries = F.array(
        *[
            F.struct(F.lit(i.name).alias("key"), F.col(i.name).alias("value"))
            for i in instructions
        ]
    )
    merged = out.withColumn(
        out_col, F.map_from_entries(F.filter(entries, lambda e: e["value"].isNotNull()))
    )
    return merged


def agentic_map_routed(
    df: DataFrame,
    instructions: tuple[Instruction, ...],
    llms: dict[str, LlmClient],
    router,
    default_task: str,
    kernels: dict[str, TaskKernel] | None = None,
    id_col: str = "doc_id",
    out_col: str = "agent_results",
) -> DataFrame:
    """RUNTIME-routed supervisor fan-out: ``router`` is a Column expression
    evaluated per RECORD whose value picks the agent (LLM + kernel) that
    runs the stage's instructions for that record — the dataflow form of
    the reference supervisor's conditional ``Send`` edges
    (``impl/agentic_mr/v0.py:118-137``), where :func:`agentic_map` covers
    only compile-time per-instruction routing.

    NULL or unregistered router values fall back to ``default_task``
    (which must be a key of ``llms``). Plan shape: one filter branch per
    registered task — each kernel sees ONLY its routed rows — then a
    ``unionByName`` and the same map-merge as :func:`agentic_map`. The
    input is scanned once per distinct task; tasks are an enum of agent
    types (a handful), never data-cardinality, so the multiplier is
    bounded and each branch's scan carries the router predicate down to
    the source.
    """
    if default_task not in llms:
        raise ValueError(f"default_task {default_task!r} not in llms {sorted(llms)}")
    kernels = kernels or {}
    routed = df.withColumn(
        "__task",
        F.when(router.isin(*llms), router).otherwise(F.lit(default_task)),
    )
    branches = []
    for task, llm in llms.items():
        sub = routed.filter(F.col("__task") == task)
        kernel = kernels.get(task, default_kernel)
        branches.append(kernel(sub, instructions, llm))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    entries = F.array(
        *[
            F.struct(F.lit(i.name).alias("key"), F.col(i.name).alias("value"))
            for i in instructions
        ]
    )
    return out.withColumn(
        out_col, F.map_from_entries(F.filter(entries, lambda e: e["value"].isNotNull()))
    ).drop("__task")
