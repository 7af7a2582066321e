"""LLM kernel — the engine's one bespoke physical operator (SURVEY.md L1-L5).

Two interchangeable clients:

- :class:`MockLlm` — deterministic: completion = md5 of the prompt (optionally
  wrapped). Compiles to a *pure Column expression*, which makes every LLM
  pipeline testable offline and oracle-checkable (any SQL engine with md5
  reproduces it). Mirrors the reference's determinism intent
  (seed=2 / temperature~0, ``llm_cli.py:37-41``) but actually achieves it.

- :class:`OpenAiLlm` — the real thing: an Arrow-batched ``mapInPandas``
  kernel that runs an asyncio event loop per batch with bounded concurrency
  (the reference's per-record ``asyncio.gather``,
  ``instructions_runners.py:144-148``, inverted into Spark's model: records
  parallelize across partitions, per-batch fan-out inside the kernel), with
  the reference's length-retry policy (``llm_cli.py:123-135``: <=3 retries on
  finish_reason=="length" with temperature 1.0 + frequency_penalty).

At 100 TB the LLM call is ~10^6x slower than the scan, so the physical design
is entirely about the kernel: batch size = partition slice (control with
``repartition``), identical shared prompt prefixes across rows preserve
server-side KV prefix caching, and the cache-table protocol
(:mod:`instructionspipe_spark.plans.cache`) collapses duplicate prompts
before any network call.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class LlmClient:
    """Interface: turn a prompt column into a completion column."""

    #: True when :meth:`completion_column` exists (pure-expression client).
    expression_based = False

    def completion_column(self, prompt: Column) -> Column:  # pragma: no cover
        raise NotImplementedError

    def complete_df(self, df: DataFrame, prompt_col: str, out_col: str) -> DataFrame:
        """Default: add ``out_col`` with the completion of ``prompt_col``."""
        if self.expression_based:
            return df.withColumn(out_col, self.completion_column(F.col(prompt_col)))
        raise NotImplementedError


@dataclass(frozen=True)
class MockLlm(LlmClient):
    """Deterministic mock: completion = ``md5(model || ':' || prompt)``.

    The model name participates so multi-model routing (L3) is observable in
    tests. Pure expression — stays in whole-stage codegen.
    """

    model: str = "mock"
    expression_based = True

    def completion_column(self, prompt: Column) -> Column:
        return F.md5(F.concat(F.lit(self.model), F.lit(":"), prompt))


@dataclass(frozen=True)
class OpenAiLlm(LlmClient):
    """Async OpenAI-compatible client kernel (gated: requires ``openai``).

    Parameters mirror the reference client (``llm_cli.py:31-62``): base_url /
    api_key from env, seed, temperature, top_p, max_tokens; plus kernel knobs
    (max_concurrency per batch, retry budget).
    """

    model: str = "gpt-4o-mini"
    base_url: str | None = None
    api_key_env: str = "OPENAI_API_KEY"
    temperature: float = 0.0
    top_p: float = 0.01
    seed: int = 2
    max_tokens: int = 4096
    max_concurrency: int = 16
    length_retries: int = 3
    expression_based = False

    def complete_df(self, df: DataFrame, prompt_col: str, out_col: str) -> DataFrame:
        import pandas as pd  # noqa: F401

        model = self.model
        base_url = self.base_url
        api_key_env = self.api_key_env
        temperature = self.temperature
        top_p = self.top_p
        seed = self.seed
        max_tokens = self.max_tokens
        max_concurrency = self.max_concurrency
        length_retries = self.length_retries

        out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.StringType())])

        def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            import asyncio

            import openai

            client = openai.AsyncOpenAI(
                base_url=base_url, api_key=os.environ.get(api_key_env, "EMPTY")
            )
            sem = asyncio.Semaphore(max_concurrency)

            async def one(prompt: str | None) -> str | None:
                # Empty-instruction predicate (P6/llm_cli.py:91-99): skip the
                # network call entirely for null/empty prompts.
                if prompt is None or not prompt.strip():
                    return None
                async with sem:
                    temp, freq = temperature, 0.0
                    for _ in range(length_retries + 1):
                        resp = await client.chat.completions.create(
                            model=model,
                            messages=[{"role": "user", "content": prompt}],
                            temperature=temp,
                            top_p=top_p,
                            seed=seed,
                            max_tokens=max_tokens,
                            frequency_penalty=freq,
                        )
                        choice = resp.choices[0]
                        if choice.finish_reason != "length":
                            return choice.message.content
                        # reference's escalation on truncation (llm_cli.py:123-135)
                        temp, freq = 1.0, 0.2
                    return choice.message.content

            async def run_batch(prompts: list) -> list:
                return await asyncio.gather(*(one(p) for p in prompts))

            for pdf in batches:
                loop = asyncio.new_event_loop()
                try:
                    pdf[out_col] = loop.run_until_complete(run_batch(list(pdf[prompt_col])))
                finally:
                    loop.close()
                yield pdf

        return df.mapInPandas(kernel, schema=out_schema)
