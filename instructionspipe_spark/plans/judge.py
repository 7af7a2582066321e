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
        ROUND(SUM(factuality) / COUNT(1), 2) AS avg_factuality,
        MIN(factuality) AS min_factuality,
        MAX(factuality) AS max_factuality,
        ROUND(SUM(high_factuality) / COUNT(1), 2) AS high_factuality_rate,
        ROUND(SUM(eligibility) / COUNT(1), 2) AS avg_eligibility,
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
