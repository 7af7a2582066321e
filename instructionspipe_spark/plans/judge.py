"""LLM-as-judge scoring + metric aggregation (SURVEY.md L7/L8, §2.4).

The reference prompts judge models per record, parses a JSON label, maps
labels to scores, mean-ensembles across models
(``apps/llm_as_a_judge/eval_with_facts.py:428-555``), then aggregates with a
4-CTE DuckDB query (``:22-81``). Here the label->score maps are ``when``
expressions, the ensemble is an ``avg`` over an exploded per-model column,
and the metric CTE runs verbatim-shaped in Spark SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from instructionspipe_spark.functions.text import fence_strip
from instructionspipe_spark.plans.llm_kernel import LlmClient


def factuality_score(label: Column) -> Column:
    """'supported' -> 1.0 else 0.0; NULL (parse failure) -> 0.5
    (eval_with_facts.py:448-461)."""
    return (
        F.when(label.isNull(), F.lit(0.5))
        .when(F.lower(label) == "supported", F.lit(1.0))
        .otherwise(F.lit(0.0))
    )


def eligibility_score(label: Column) -> Column:
    """'No Issues' -> 1.0, 'Minor Issue(s)' -> 0.25, else 0.0; parse failure
    -> 0.5 (eval_with_facts.py:481-501)."""
    return (
        F.when(label.isNull(), F.lit(0.5))
        .when(F.lower(label) == "no issues", F.lit(1.0))
        .when(F.lower(label).startswith("minor issue"), F.lit(0.25))
        .otherwise(F.lit(0.0))
    )


def parse_judgement(raw: Column, field: str = "label") -> Column:
    """Pull a field out of the judge's (possibly fenced) JSON answer."""
    cleaned = fence_strip(raw)
    return F.get_json_object(cleaned, f"$.{field}")


def ensemble_scores(df: DataFrame, group_cols: list[str], score_col: str, out_col: str = "score") -> DataFrame:
    """Mean ensemble across judge models (judgements_init,
    eval_with_facts.py:549-555): average the per-model score per judged item."""
    return df.groupBy(*group_cols).agg(F.avg(score_col).alias(out_col))


# The reference's metric aggregation SQL (eval_with_facts.py:22-81),
# re-expressed over a view `judge_results(name, factuality, eligibility)`.
# Same CTE shape: per-instruction metrics then overall projection. Runs
# unchanged in Spark SQL and DuckDB — the differential test runs it in both.
METRICS_SQL = """
WITH scored AS (
    SELECT
        name,
        factuality,
        eligibility,
        CAST(CASE WHEN factuality >= 0.5 THEN 1 ELSE 0 END AS DOUBLE) AS high_factuality
    FROM judge_results
),
per_instruction AS (
    SELECT
        name,
        CAST(ROUND(CAST(SUM(factuality) / COUNT(1) AS DECIMAL(25,6)), 2) AS DOUBLE) AS avg_factuality,
        MIN(factuality) AS min_factuality,
        MAX(factuality) AS max_factuality,
        CAST(ROUND(CAST(SUM(high_factuality) / COUNT(1) AS DECIMAL(25,6)), 2) AS DOUBLE) AS high_factuality_rate,
        CAST(ROUND(CAST(SUM(eligibility) / COUNT(1) AS DECIMAL(25,6)), 2) AS DOUBLE) AS avg_eligibility,
        COUNT(1) AS n
    FROM scored
    GROUP BY name
)
SELECT * FROM per_instruction
"""


def judge_metrics(spark: SparkSession, results: DataFrame) -> DataFrame:
    """Run the metric aggregation over a results DataFrame with columns
    (name, factuality, eligibility)."""
    results.createOrReplaceTempView("judge_results")
    return spark.sql(METRICS_SQL)


def group_relative_advantage(
    df: DataFrame,
    reward_col: str,
    group_cols: list[str],
    out_col: str = "advantage",
    eps: float = 1e-6,
) -> DataFrame:
    """GRPO's group-relative reward normalization: ``(r - mean_group) /
    (stddev_pop_group + eps)`` — the piece of the reference's GRPO training
    loop (judge-as-reward, ``apps/training/grpo_plugin.py:181-243``; the
    group baseline itself is standard GRPO) that is a DATA operator rather
    than a trainer. Two-phase agg + join-back (map-side partials, AQE-
    splittable), same skew-safe shape as the dedup representatives; a
    degenerate group (all rewards equal) gets advantage 0, not NULL/inf."""
    stats = df.groupBy(*group_cols).agg(
        F.avg(reward_col).alias("__mu"), F.stddev_pop(reward_col).alias("__sigma")
    )
    return (
        df.join(stats, group_cols)
        .withColumn(
            out_col, (F.col(reward_col) - F.col("__mu")) / (F.col("__sigma") + F.lit(eps))
        )
        .drop("__mu", "__sigma")
    )


def mock_judge_response(
    model: Column | str, prompt: Column, labels: tuple[str, str] = ("supported", "unsupported")
) -> Column:
    """Deterministic judge answer ``{"label": ...}`` chosen by the
    md5(model:prompt) hash; ``model`` may be a Column (e.g. a per-candidate
    name) so fanned-out judging stays one expression over exploded rows."""
    m = model if isinstance(model, Column) else F.lit(model)
    h = F.md5(F.concat(m, F.lit(":"), prompt))
    pos, neg = labels
    return F.when(
        F.substring(h, 1, 1).isin(*"01234567"),
        F.lit('{"label": "%s"}' % pos),
    ).otherwise(F.lit('{"label": "%s"}' % neg))


class MockJudgeLlm(LlmClient):
    """Expression-based deterministic judge: answers parseable JSON
    ``{"label": ...}`` with the label chosen by the prompt hash — the offline
    stand-in for an L7/L8 judge model (labels differ per model name, so the
    A9 ensemble is observable)."""

    expression_based = True

    def __init__(self, model: str = "judge", labels: tuple[str, str] = ("supported", "unsupported")):
        self.model = model
        self.labels = labels

    def completion_column(self, prompt: Column) -> Column:
        return mock_judge_response(self.model, prompt, self.labels)


def run_judge_fanout(
    df: DataFrame,
    prompt_col: str,
    models: list[str],
    id_cols: list[str],
    score_fn=factuality_score,
    llm_factory=MockJudgeLlm,
    raw_col_out: str | None = None,
) -> DataFrame:
    """L7 fan-out + A9 ensemble: judge the prompt with each model, parse the
    JSON label, map to a score, mean-ensemble across models (reference
    eval_with_facts.py:503-555). One narrow stage per model (same row, no
    shuffle), then one groupBy on the id for the ensemble. With
    ``raw_col_out`` the per-model raw judge answers are kept as an array
    column (the reference's per-judgement rationales,
    eval_with_facts.py:656-658)."""
    out = df
    score_cols = []
    for m in models:
        raw_col, score_col = f"__raw_{m}", f"__score_{m}"
        out = llm_factory(m).complete_df(out, prompt_col, raw_col)
        out = out.withColumn(score_col, score_fn(parse_judgement(F.col(raw_col))))
        score_cols.append(score_col)
    # mean across the per-model score columns — same-row ensemble, no shuffle
    mean = sum((F.col(c) for c in score_cols[1:]), F.col(score_cols[0])) / F.lit(len(score_cols))
    out = out.withColumn("score", mean)
    if raw_col_out is not None:
        out = out.withColumn(raw_col_out, F.array(*[F.col(f"__raw_{m}") for m in models]))
    return out.drop(*[c for m in models for c in (f"__raw_{m}", f"__score_{m}")])
