"""S10 serving layer: in-process round-trip of one record through the
instructions map/reduce pipeline over HTTP (reference:
tableqa_codeact.py:300-341 serves one-record runs the same way)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest


@pytest.fixture(scope="module")
def served(spark):
    from instructionspipe_spark.registry import DOC_PIPELINE
    from instructionspipe_spark.serving import PipelineService, serve_background

    service = PipelineService(spark, DOC_PIPELINE)
    server, base = serve_background(service)
    yield service, base
    server.shutdown()


def _get(url: str):
    try:
        with urllib.request.urlopen(url, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(url: str, payload) -> tuple[int, dict]:
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_ping_and_models(served):
    _service, base = served
    status, body = _get(base + "/ping")
    assert status == 200 and body == {"ok": True}
    status, body = _get(base + "/get_models")
    assert status == 200 and body == ["mock"]


def test_one_record_roundtrip_matches_batch(served, spark):
    """The served result must be byte-identical to the batch path on the
    same record — they share the compiled plan."""
    from instructionspipe_spark.plans.compiler import run_pipeline
    from instructionspipe_spark.registry import DOC_PIPELINE

    record = {"doc_id": 7, "text": "A short document about rivers.", "lang": "en"}
    status, body = _post(served[1] + "/pipeline/run", record)
    assert status == 200
    assert set(body) >= {"doc_id", "text", "lang", "summary", "keywords", "report", "result", "session_id"}

    batch = run_pipeline(spark.createDataFrame([record]), DOC_PIPELINE).collect()[0].asDict()
    assert body == batch


def test_bad_requests(served):
    _service, base = served
    status, body = _post(base + "/pipeline/run", [1, 2])
    assert status == 400 and "error" in body
    status, body = _post(base + "/nope", {"x": 1})
    assert status == 404
    status, body = _get(base + "/nope")
    assert status == 404


def test_concurrent_requests(served):
    """ThreadingHTTPServer dispatches each request on its own thread; Spark
    supports concurrent driver actions — 8 parallel one-record runs must all
    succeed and be per-record correct."""
    from concurrent.futures import ThreadPoolExecutor

    _service, base = served

    def one(i: int):
        status, body = _post(
            base + "/pipeline/run",
            {"doc_id": i, "text": f"document number {i} about rivers", "lang": "en"},
        )
        return status, body

    with ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(one, range(8)))
    assert all(status == 200 for status, _ in results)
    assert [body["doc_id"] for _, body in results] == list(range(8))
    # deterministic MockLlm: same text -> same summary; distinct texts differ
    summaries = {body["summary"] for _, body in results}
    assert len(summaries) == 8


def test_record_validation(served):
    """ADVICE r4: explicit schema handling — null values and missing
    required fields are 400s with clear messages, never a 500 from
    createDataFrame's dict inference."""
    _service, base = served
    # DOC_PIPELINE's stage-0 scopes require text + lang.
    status, body = _post(base + "/pipeline/run", {"doc_id": 1})
    assert status == 400 and "missing required field" in body["error"]
    assert "text" in body["error"] and "lang" in body["error"]
    # null value without an input_schema: typed 400, not a 500
    status, body = _post(
        base + "/pipeline/run", {"doc_id": 1, "text": None, "lang": "en"}
    )
    assert status == 400 and "input_schema" in body["error"]
    # nested dict is uninferable from one record
    status, body = _post(
        base + "/pipeline/run",
        {"doc_id": 1, "text": "t", "lang": "en", "meta": {"a": 1}},
    )
    assert status == 400 and "unsupported" in body["error"]


def test_explicit_input_schema(spark):
    """With an explicit StructType: types are pinned (no drift from the
    batch schema), nullable fields accept null, non-nullable nulls and
    unknown fields are 400s."""
    from pyspark.sql import types as T

    from instructionspipe_spark.registry import DOC_PIPELINE
    from instructionspipe_spark.serving import PipelineService, serve_background

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), nullable=False),
            T.StructField("text", T.StringType(), nullable=False),
            T.StructField("lang", T.StringType(), nullable=True),
        ]
    )
    service = PipelineService(spark, DOC_PIPELINE, input_schema=schema)
    server, base = serve_background(service)
    try:
        ok = {"doc_id": 3, "text": "about mountains", "lang": None}
        status, body = _post(base + "/pipeline/run", ok)
        assert status == 200 and body["doc_id"] == 3 and body["lang"] is None
        status, body = _post(
            base + "/pipeline/run", {"doc_id": None, "text": "t", "lang": "en"}
        )
        assert status == 400 and "non-nullable" in body["error"]
        status, body = _post(
            base + "/pipeline/run",
            {"doc_id": 4, "text": "t", "lang": "en", "extra": 1},
        )
        assert status == 400 and "unknown field" in body["error"]
    finally:
        server.shutdown()
