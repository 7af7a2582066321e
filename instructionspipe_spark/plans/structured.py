"""L12 constrained JSON decoding — the declared-schema parse stage.

The reference declares an OpenAI ``response_format`` JSON-schema envelope
(``apps/archive/self-verified-mr/self_verification_mr.py:19-34``) and wires
it into the client (``src/python/instructionspipe/llm_cli.py:119-121``,
disabled there for reasoning-model compatibility). The engine's version has
two halves:

- request side: ``OpenAiLlm(response_format_json=...)`` passes the envelope
  to the API (``plans/llm_kernel.py``);
- parse side (this module): the declared schema compiles to a Spark
  ``StructType`` and the completion column parses with ``from_json`` after
  the F7 fence-strip fallback — models that ignore the constraint and wrap
  output in ```` ```json ```` fences still parse; genuinely malformed rows
  yield NULL struct fields instead of failing the job, so one bad
  completion can never kill a 100 TB pipeline (PERMISSIVE semantics, same
  policy as the JSONL scan).

Everything stays expression-side (whole-stage codegen) — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from instructionspipe_spark.functions.text import fence_strip

_SCALARS = {
    "string": T.StringType,
    "number": T.DoubleType,
    "integer": T.LongType,
    "boolean": T.BooleanType,
}


def json_schema_to_spark(schema: dict) -> T.DataType:
    """Compile the JSON-schema subset the OpenAI structured-output API
    accepts (object / array / string / number / integer / boolean, nested)
    into a Spark type. Unknown or missing ``type`` falls back to string —
    permissive, like the rest of the ingestion surface."""
    t = schema.get("type")
    if t == "object":
        props = schema.get("properties", {})
        return T.StructType(
            [T.StructField(name, json_schema_to_spark(sub)) for name, sub in props.items()]
        )
    if t == "array":
        return T.ArrayType(json_schema_to_spark(schema.get("items", {})))
    return _SCALARS.get(t, T.StringType)()


def response_format_envelope(name: str, schema: dict) -> dict:
    """The OpenAI ``response_format`` envelope for a declared schema —
    byte-compatible with the reference's INIT_GEN_SCHEMA shape."""
    return {
        "type": "json_schema",
        "json_schema": {"name": name, "schema": schema, "strict": True},
    }


def parse_structured_col(completion: Column, schema: dict) -> Column:
    """``from_json`` with the declared schema after fence-strip; malformed
    input parses to NULL fields (PERMISSIVE), never an error."""
    return F.from_json(fence_strip(completion), json_schema_to_spark(schema))


def parse_structured(
    df: DataFrame, completion_col: str, schema: dict, out_col: str = "parsed"
) -> DataFrame:
    """Add ``out_col`` = the completion parsed under the declared schema."""
    return df.withColumn(out_col, parse_structured_col(F.col(completion_col), schema))
