"""Drop-in twin of the reference's inference CLI
(``apps/instructions-mapreduce/inf.py``): one call takes the SAME config
JSON — ``in_data_path`` / ``out_data_path`` / ``chatml_path`` / ``llms`` /
``pipe`` (inline stages or a string path, ``inf.py:40-41``) — and runs
JSONL -> compiled pipeline -> JSONL outputs plus the two ChatML sidecars.

Differences from the reference, by design:

- Outputs are written by Spark, so each path becomes a DIRECTORY of part
  files (the distributed form of the reference's single append-mode file);
  read them back with ``spark.read.json(path)`` or any JSONL-glob reader.
- The reference's per-record try/except-continue becomes PERMISSIVE JSONL
  parsing (malformed lines null out instead of killing the job; pass
  ``corrupt_col`` through ``schema`` handling for a quarantine split).
- ``session_id`` is content-addressed (deterministic) rather than a uuid,
  so reruns are reproducible and the meta sidecar joins exactly.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from instructionspipe_spark.plans.compiler import run_pipeline
from instructionspipe_spark.plans.instructions import Pipeline, load_pipeline
from instructionspipe_spark.plans.llm_kernel import LlmClient, OpenAiLlm
from instructionspipe_spark.sources.io import read_jsonl, write_jsonl


def llms_from_config(configs: list[dict]) -> dict[str, LlmClient]:
    """The reference's ``utils.llms_init`` twin: a list of client configs
    (``api_url`` / ``model`` / ``temperature`` / ``top_p`` / ``seed`` —
    demo_configs/mapreduce_summ/ehr.json's ``llms`` section) becomes a
    ``{model_name: OpenAiLlm}`` dict, which ``run_pipeline`` uses for
    per-instruction multi-model routing (L3) exactly like the reference
    (``instructions_runners.py:83-86``)."""
    out: dict[str, LlmClient] = {}
    for c in configs:
        out[c["model"]] = OpenAiLlm(
            model=c["model"],
            base_url=(c.get("api_url") or None),
            temperature=float(c.get("temperature") or 0.0),
            top_p=float(c.get("top_p") or 0.01),
            seed=int(c.get("seed") or 2),
        )
    return out


def run_config(
    spark: SparkSession,
    config_path: str,
    llm: LlmClient | dict[str, LlmClient] | None = None,
    append_mode: bool = True,
    schema=None,
) -> DataFrame:
    """Execute one reference-shaped config end-to-end and return the result
    DataFrame (also written to the config's paths). ``llm`` overrides the
    config's ``llms`` section (tests pass ``MockLlm()``); ``append_mode``
    mirrors the reference CLI: ``False`` refuses to run if any output path
    already exists (``inf.py:45-55``)."""
    with open(config_path) as f:
        cfg = json.load(f)
    pipe: Pipeline = load_pipeline(config_path)
    out_path = cfg["out_data_path"]
    chatml_path = cfg["chatml_path"]
    meta_path = chatml_path + ".meta.jsonl"
    if not append_mode:
        for p in (out_path, chatml_path, meta_path):
            if os.path.exists(p):
                raise FileExistsError(
                    f"output path exists (append_mode=False, reference inf.py:45-55): {p}"
                )
    if llm is None:
        llm = llms_from_config(cfg["llms"])

    records = read_jsonl(spark, cfg["in_data_path"], schema=schema)
    in_cols = list(records.columns)
    result = run_pipeline(records, pipe, llm, lineage=True)

    mode = "append" if append_mode else "overwrite"
    lineage_cols = [f"{i.name}__msgs" for stage in pipe.stages for i in stage]
    write_jsonl(result.drop(*lineage_cols), out_path, mode=mode)

    # ChatML sidecar: one row per (record, instruction), like the
    # reference's outputs["chatmls"] stream — session_id ties rows to meta.
    chatml_rows = None
    for stage in pipe.stages:
        for i in stage:
            part = result.select(
                "session_id",
                F.lit(i.name).alias("name"),
                F.col(f"{i.name}__msgs").alias("chatml"),
            )
            chatml_rows = part if chatml_rows is None else chatml_rows.unionByName(part)
    write_jsonl(chatml_rows, chatml_path, mode=mode)
    write_jsonl(result.select(*in_cols, "session_id"), meta_path, mode=mode)
    return result


def run_judge_config(
    spark: SparkSession,
    config_path: str,
    factuality_factory=None,
    eligibility_factory=None,
    schema=None,
):
    """Drop-in twin of the judge CLI (``apps/llm_as_a_judge/
    eval_with_facts.py``): the SAME config JSON — in/out paths, the
    field-name mapping (``in_text_field`` / ``out_text_field`` /
    ``instruction_field`` / ``gt_*_field``), ``max_sample_size``,
    ``extra_cols``, ``llms`` — judges every case for factuality AND
    eligibility with a per-model fan-out + mean ensemble, writes the
    result rows (reference output shape: scores, ground truths, texts,
    per-model rationale arrays, extras), and returns
    ``(results_df, metrics_df)`` where metrics is the ported per-name
    aggregation (``plans/judge.py::judge_metrics``).

    The two factories build the judge clients per model name; they default
    to the deterministic ``MockJudgeLlm`` twins (offline runs, tests) —
    pass factories wrapping ``OpenAiLlm`` with your judge system prompts
    for live judging."""
    from instructionspipe_spark.plans.judge import (
        MockJudgeLlm,
        eligibility_score,
        factuality_score,
        judge_metrics,
        run_judge_fanout,
    )

    with open(config_path) as f:
        cfg = json.load(f)
    factuality_factory = factuality_factory or MockJudgeLlm
    eligibility_factory = eligibility_factory or (
        lambda m: MockJudgeLlm(m, labels=("No Issues", "Minor Issue(s)"))
    )

    cases = read_jsonl(spark, cfg["in_data_path"], schema=schema)
    if cfg.get("max_sample_size"):
        cases = cases.limit(int(cfg["max_sample_size"]))
    in_f, out_f, instr_f = (
        cfg["in_text_field"], cfg["out_text_field"], cfg["instruction_field"],
    )
    models = [c["model"] for c in cfg["llms"]]
    prompt = F.concat(
        F.lit("## Instruction\n"), F.coalesce(F.col(instr_f), F.lit("")),
        F.lit("\n\n## Source\n"), F.coalesce(F.col(in_f), F.lit("")),
        F.lit("\n\n## Generated\n"), F.coalesce(F.col(out_f), F.lit("")),
    )
    judged = cases.withColumn("__judge_prompt", prompt)
    judged = run_judge_fanout(
        judged, "__judge_prompt", models, id_cols=[],
        score_fn=factuality_score, llm_factory=factuality_factory,
        raw_col_out="factuality_rationales",
    ).withColumnRenamed("score", "factuality")
    judged = run_judge_fanout(
        judged, "__judge_prompt", models, id_cols=[],
        score_fn=eligibility_score, llm_factory=eligibility_factory,
        raw_col_out="eligibility_rationales",
    ).withColumnRenamed("score", "eligibility")

    gt_f, gt_e = cfg.get("gt_factuality_field"), cfg.get("gt_eligibility_field")
    cols = [
        F.col("factuality"),
        F.col("eligibility"),
        (F.col(gt_f) if gt_f and gt_f in cases.columns else F.lit(None).cast("double")).alias("gt_factuality"),
        (F.col(gt_e) if gt_e and gt_e in cases.columns else F.lit(None).cast("double")).alias("gt_eligibility"),
        F.col(in_f).alias("src_text"),
        F.col(out_f).alias("gen_text"),
        F.col(instr_f).alias("instruction"),
        F.col("factuality_rationales"),
        F.col("eligibility_rationales"),
    ]
    cols += [F.col(c) for c in cfg.get("extra_cols") or () if c in cases.columns]
    if "name" not in cases.columns:  # reference fallback: out["name"] = "n/a"
        cols.append(F.lit("n/a").alias("name"))
    else:
        cols.append(F.col("name"))
    results = judged.select(*cols)
    write_jsonl(results, cfg["out_data_path"], mode="overwrite")
    return results, judge_metrics(spark, results)
