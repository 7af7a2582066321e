"""Tests for the Arrow-batched async LLM kernel (SURVEY.md L1/L4 machinery)
using the offline EchoAsyncLlm — full mapInPandas + event loop + semaphore
path, no network."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from instructionspipe_spark.plans.instructions import Instruction, Pipeline
from instructionspipe_spark.plans.llm_kernel import EchoAsyncLlm, MockLlm


def test_async_kernel_matches_expression_mock(spark):
    """The async kernel and the pure-expression MockLlm must agree — the
    same pipeline runs with either client interchangeably."""
    df = spark.createDataFrame([(i, f"text {i}") for i in range(50)], ["id", "p"])
    got = {r["id"]: r["ans"] for r in EchoAsyncLlm().complete_df(df, "p", "ans").collect()}
    want = {r["id"]: r["ans"] for r in MockLlm().complete_df(df, "p", "ans").collect()}
    assert got == want
    assert got[3] == hashlib.md5(b"mock:text 3").hexdigest()


def test_async_kernel_skips_null_and_empty(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "  \n "), (4, "real")], "id int, p string"
    )
    got = {r["id"]: r["ans"] for r in EchoAsyncLlm().complete_df(df, "p", "ans").collect()}
    assert got[1] is None and got[2] is None and got[3] is None
    assert got[4] == hashlib.md5(b"mock:real").hexdigest()


def test_async_kernel_in_pipeline(spark):
    """run_pipeline with the kernel client: P6 guard nulls the prompt, the
    kernel skips it; valid rows match the MockLlm result exactly."""
    from instructionspipe_spark.plans.compiler import run_pipeline

    pipe = Pipeline(stages=((Instruction(name="s", scope=("text",), content="go"),),))
    df = spark.createDataFrame([(1, "hello"), (2, None)], "id int, text string")
    async_rows = {r["id"]: r["s"] for r in run_pipeline(df, pipe, EchoAsyncLlm()).collect()}
    mock_rows = {r["id"]: r["s"] for r in run_pipeline(df, pipe, MockLlm()).collect()}
    assert async_rows == mock_rows
    assert async_rows[2] is None and async_rows[1] is not None


def test_async_kernel_bounded_concurrency(spark):
    out = EchoAsyncLlm(max_concurrency=2).complete_df(
        spark.createDataFrame([(i, f"p{i}") for i in range(20)], ["id", "p"]), "p", "ans"
    )
    assert out.filter(F.col("ans").isNull()).count() == 0
