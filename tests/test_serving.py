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
