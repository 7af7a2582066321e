"""Tests for agentic MR fan-out (L11) and the CodeAct loop (L10)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from instructionspipe_spark.plans.agentic import agentic_map
from instructionspipe_spark.plans.codeact import codeact_loop, codeact_qa, tag_extract_py
from instructionspipe_spark.plans.instructions import Instruction
from instructionspipe_spark.plans.llm_kernel import MockLlm


def test_agentic_map_merges_task_outputs(spark):
    df = spark.createDataFrame([(1, "hello", "en")], ["doc_id", "text", "lang"])
    instructions = (
        Instruction(name="summ", scope=("text",), content="summarize"),
        Instruction(name="kw", scope=("text",), content="keywords"),
        Instruction(name="lid", scope=("lang",), content="lang id"),
    )
    out = agentic_map(
        df,
        instructions,
        MockLlm(),
        task_of=lambda i: "text" if "text" in i.scope else "meta",
    ).first()
    merged = out["agent_results"]
    assert set(merged) == {"summ", "kw", "lid"}
    assert merged["summ"] == out["summ"]  # map mirrors the columns


def test_agentic_map_skips_null_outputs(spark):
    df = spark.createDataFrame([(1, None)], "doc_id int, text string")
    instructions = (Instruction(name="s", scope=("text",)),)
    out = agentic_map(df, instructions, MockLlm()).first()
    assert out["agent_results"] == {}  # P6-null results pruned from state merge


def test_tag_extract_fallbacks():
    assert tag_extract_py("x <code>print(1)</code> y") == "print(1)"
    assert tag_extract_py("```python\nprint(2)\n```") == "print(2)"
    assert tag_extract_py("no code here") is None


def test_codeact_loop_error_feedback():
    calls = []

    def code_fn(msgs):
        calls.append(len(msgs))
        if len(calls) == 1:
            return "<code>BROKEN</code>"
        return "<code>GOOD</code>"

    def run_fn(code):
        return "Traceback: boom" if "BROKEN" in code else "42\n"

    res = codeact_loop("q", "ctx", code_fn, run_fn)
    assert res["answer"] == "42\n"
    assert res["rounds"] == 2
    # error round appended the failure as a user message
    roles = [m["role"] for m in res["msgs"]]
    assert roles == ["system", "user", "assistant", "user", "assistant"]


def test_codeact_loop_textual_answer_terminates():
    res = codeact_loop("q", "ctx", lambda msgs: "the answer is 7", lambda c: "")
    assert res["answer"] == "the answer is 7" and res["rounds"] == 1


def test_codeact_qa_requires_flag(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_ENABLE_CODEACT", raising=False)
    df = spark.createDataFrame([("q", "c")], ["q", "c"])
    with pytest.raises(RuntimeError, match="disabled"):
        codeact_qa(df, "q", "c", code_fn=lambda m: "x")


def test_codeact_qa_dataframe_kernel(spark):
    df = spark.createDataFrame([(1, "sum?", "1+1"), (2, "prod?", "2*3")], ["id", "q", "c"])
    out = codeact_qa(
        df,
        "q",
        "c",
        code_fn=lambda msgs: "answer: " + msgs[1]["content"].split("?")[0],
        run_fn=lambda code: "",
    )
    got = {r["id"]: r["answer"] for r in out.collect()}
    assert got == {1: "answer: sum", 2: "answer: prod"}


def test_agentic_map_routed_runtime_routing(spark):
    """Dynamic routing (VERDICT r4 gap 4): the router column decides per
    RECORD which llm runs the instructions; unknown/null router values fall
    back to the default task; results differ by model hash."""
    from pyspark.sql import functions as F

    from instructionspipe_spark.plans.agentic import agentic_map_routed
    from instructionspipe_spark.plans.instructions import Instruction
    from instructionspipe_spark.plans.llm_kernel import MockLlm

    docs = spark.createDataFrame(
        [(0, "hello", "en"), (1, "hallo", "de"), (2, "hei", None), (3, "hola", "zz")],
        "doc_id long, text string, lang string",
    )
    instr = (Instruction(name="summary", scope=("text",), content="summarize"),)
    out = agentic_map_routed(
        docs,
        instr,
        llms={"en_expert": MockLlm(model="en_expert"), "generalist": MockLlm(model="generalist")},
        router=F.when(F.col("lang") == "en", F.lit("en_expert")),  # NULL for everyone else
        default_task="generalist",
    )
    rows = {r["doc_id"]: r["agent_results"]["summary"] for r in out.collect()}
    assert len(rows) == 4
    # doc 0 hashed by en_expert; 1-3 (incl. NULL router) by generalist
    single_en = agentic_map_routed(
        docs.filter("doc_id = 0"), instr,
        llms={"en_expert": MockLlm(model="en_expert")},
        router=F.lit("en_expert"), default_task="en_expert",
    ).collect()[0]["agent_results"]["summary"]
    assert rows[0] == single_en
    assert rows[1] != rows[0]
    gen_only = agentic_map_routed(
        docs.filter("doc_id = 1"), instr,
        llms={"generalist": MockLlm(model="generalist")},
        router=F.lit("generalist"), default_task="generalist",
    ).collect()[0]["agent_results"]["summary"]
    assert rows[1] == gen_only
    import pytest

    with pytest.raises(ValueError, match="default_task"):
        agentic_map_routed(docs, instr, llms={"a": MockLlm()}, router=F.lit("a"), default_task="missing")
