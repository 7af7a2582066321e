"""CodeAct table-QA kernel (SURVEY.md L10) — feature-flagged, OFF by default.

The reference's CodeAct loop (``apps/poc-codaact-tableqa/tableqa_codeact.py:
175-235``): the LLM writes Python, the code runs in a sandboxed subprocess
(``:143-172``), a Traceback is fed back as a user message, up to
``max_rounds`` (5). The LangGraph ``Command`` loop is control flow around a
per-record iteration — in Spark it compiles to a ``while`` inside an
Arrow-batched ``mapInPandas`` kernel (executor-side subprocess execution).

SECURITY: executing model-generated code is opt-in —
``SPARK_GRAFT_ENABLE_CODEACT=1`` must be set or :func:`codeact_qa` raises.
The sandbox is a subprocess with a wall-clock timeout and no network
guarantees beyond the host's; production deployments should swap
``sandbox_run`` for a jailed executor. With the default :class:`MockLlm`-
style ``code_fn`` the loop is deterministic and testable without any
subprocess (the test suite exercises the loop mechanics, not arbitrary code).
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MAX_ROUNDS = 5  # reference default (tableqa_codeact.py:93)
_TAG_OPEN, _TAG_CLOSE = "<code>", "</code>"


def tag_extract_py(text: str) -> str | None:
    """Python twin of functions.text.tag_extract for use inside the kernel
    (fallback order: <code>, ```python fence — reference :117-134)."""
    for open_tag, close_tag in ((_TAG_OPEN, _TAG_CLOSE), ("```python", "```"), ("```", "```")):
        start = text.find(open_tag)
        if start != -1:
            end = text.find(close_tag, start + len(open_tag))
            if end != -1:
                return text[start + len(open_tag) : end].strip()
    return None


def sandbox_run(code: str, timeout_s: int = 30) -> str:
    """Run code in a subprocess; stdout+stderr combined (Traceback detection
    is string-based, matching the reference's error predicate P7)."""
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(code)
        path = f.name
    try:
        proc = subprocess.run(
            [sys.executable, path],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
        return (proc.stdout or "") + (proc.stderr or "")
    except subprocess.TimeoutExpired:
        return "Traceback: sandbox timeout"
    finally:
        os.unlink(path)


def codeact_loop(
    question: str,
    context: str,
    code_fn: Callable[[list[dict]], str],
    run_fn: Callable[[str], str] = sandbox_run,
    max_rounds: int = MAX_ROUNDS,
) -> dict:
    """One record's CodeAct iteration: ask -> extract code -> run -> feed
    errors back. ``code_fn(msgs) -> completion`` is the model; ``run_fn`` the
    executor. Returns {answer, rounds, msgs}."""
    msgs = [
        {"role": "system", "content": "Answer by writing Python inside <code></code>."},
        {"role": "user", "content": f"{question}\n\n{context}"},
    ]
    answer = None
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        completion = code_fn(msgs)
        msgs.append({"role": "assistant", "content": completion})
        code = tag_extract_py(completion)
        if code is None:  # terminal textual answer (reference :194-203)
            answer = completion
            break
        result = run_fn(code)
        if "Traceback" in result:  # error predicate P7
            msgs.append({"role": "user", "content": f"Execution failed:\n{result}\nFix it."})
            continue
        answer = result
        break
    return {"answer": answer, "rounds": rounds, "msgs": msgs}


def codeact_qa(
    df: DataFrame,
    question_col: str,
    context_col: str,
    code_fn: Callable[[list[dict]], str],
    run_fn: Callable[[str], str] | None = None,
    max_rounds: int = MAX_ROUNDS,
    out_col: str = "answer",
) -> DataFrame:
    """CodeAct over a DataFrame: Arrow-batched kernel, one loop per row,
    rows parallelized across executors. Requires
    ``SPARK_GRAFT_ENABLE_CODEACT=1`` when using the real sandbox."""
    if run_fn is None:
        if os.environ.get("SPARK_GRAFT_ENABLE_CODEACT") != "1":
            raise RuntimeError(
                "CodeAct subprocess sandbox is disabled; set "
                "SPARK_GRAFT_ENABLE_CODEACT=1 or pass a custom run_fn"
            )
        run_fn = sandbox_run

    from instructionspipe_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField(out_col, T.StringType()), T.StructField("rounds", T.IntegerType())]
    )

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            answers, rounds = [], []
            for q, c in zip(pdf[question_col], pdf[context_col]):
                res = codeact_loop(str(q), str(c), code_fn, run_fn, max_rounds)
                answers.append(res["answer"])
                rounds.append(res["rounds"])
            pdf = pdf.copy()
            pdf[out_col] = answers
            pdf["rounds"] = rounds
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)
