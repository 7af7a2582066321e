"""Multi-turn LLM chains (SURVEY.md L6, L9).

- :func:`batch_chat` — the degenerate single-round chat over a column
  (reference ``apps/tools/run_single_round_chat.py:44-78``): build ChatML
  from configured (role, column) pairs, complete, write the answer column.

- :func:`self_verification_chain` — the reference's archive chain
  (``apps/archive/self-verified-mr/self_verification_mr.py:329-393``): for a
  given instruction output, run three sequential rounds — extraction,
  omission check ("what's missed? complement"), evidence attribution — each
  round appending to the same ChatML conversation, then a prune step. Each
  round is one engine stage over the whole dataset (records parallelize;
  rounds are sequential, exactly the reference's dependency structure).

Determinism: with MockLlm every round's completion is md5(model:prompt), so
the chain is end-to-end reproducible and differential-testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

import instructionspipe_spark.functions.chatml as cm
from instructionspipe_spark.plans.llm_kernel import LlmClient, MockLlm

#: Round templates, abridged from the reference's prompts
#: (self_verification_mr.py:255-267 placeholder style).
EXTRACTION_TMPL = "Extract the key elements for: __INSTRUCTION__\n\n__CONTEXT__"
OMISSION_TMPL = "What did you miss? Complement the previous answer."
ATTRIBUTION_TMPL = "For each element, cite the supporting span from the input."


def _flatten_prompt(msgs: Column) -> Column:
    """Serialize a ChatML conversation into one prompt string for clients
    that take flat prompts (role-tagged, byte-stable)."""
    return cm.chatml_to_text(msgs)


def chain_round(
    df: DataFrame,
    msgs_col: str,
    user_text: Column,
    out_col: str,
    llm: LlmClient = MockLlm(),
) -> DataFrame:
    """One conversation round: append the user message, complete on the full
    conversation, append the assistant reply. Adds ``out_col`` with the
    reply; rewrites ``msgs_col``."""
    appended = F.concat(F.col(msgs_col), F.array(cm.msg("user", user_text)))
    out = df.withColumn(msgs_col, appended)
    out = out.withColumn("__chain_prompt", _flatten_prompt(F.col(msgs_col)))
    out = llm.complete_df(out, "__chain_prompt", out_col)
    out = out.withColumn(
        msgs_col, F.concat(F.col(msgs_col), F.array(cm.msg("assistant", F.col(out_col))))
    )
    return out.drop("__chain_prompt")


def batch_chat(
    df: DataFrame,
    role_cols: list[tuple[str, str]],
    out_col: str = "answer",
    llm: LlmClient = MockLlm(),
    msgs_col: str = "msgs",
) -> DataFrame:
    """Single-round chat (L6): ChatML from (role, column) pairs -> completion.

    ``role_cols`` e.g. ``[("system", "sys_prompt"), ("user", "question")]``.
    """
    msgs = cm.chatml(*[cm.msg(role, F.col(col)) for role, col in role_cols])
    out = df.withColumn(msgs_col, msgs)
    out = out.withColumn("__chat_prompt", _flatten_prompt(F.col(msgs_col)))
    out = llm.complete_df(out, "__chat_prompt", out_col)
    out = out.withColumn(
        msgs_col, F.concat(F.col(msgs_col), F.array(cm.msg("assistant", F.col(out_col))))
    )
    return out.drop("__chat_prompt")


def self_verification_chain(
    df: DataFrame,
    instruction_col: str,
    context_col: str,
    llm: LlmClient = MockLlm(),
    msgs_col: str = "sv_msgs",
) -> DataFrame:
    """Three-round self-verification (L9): extraction -> omission check ->
    evidence attribution, threading one ChatML conversation; adds columns
    ``extraction``, ``complement``, ``attribution`` and the full ``sv_msgs``
    lineage. Rounds are sequential by data dependency; rows parallelize."""
    from instructionspipe_spark.functions.text import template_fill

    out = df.withColumn(msgs_col, F.array().cast(cm.CHATML_TYPE))
    round1 = template_fill(
        EXTRACTION_TMPL,
        {"__INSTRUCTION__": F.col(instruction_col), "__CONTEXT__": F.col(context_col)},
    )
    out = chain_round(out, msgs_col, round1, "extraction", llm)
    out = chain_round(out, msgs_col, F.lit(OMISSION_TMPL), "complement", llm)
    out = chain_round(out, msgs_col, F.lit(ATTRIBUTION_TMPL), "attribution", llm)
    return out
