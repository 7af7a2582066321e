"""S10 — thin HTTP serving layer over a compiled pipeline.

The reference serves one-record pipeline runs over FastAPI + uvicorn
(``apps/poc-codaact-tableqa/tableqa_codeact.py:300-341``: CORS middleware,
``GET /get_models``, a POST endpoint that feeds one record through the
pipeline and returns its state). This engine's equivalent is deliberately
OFF the data plane: a stdlib ``ThreadingHTTPServer`` wrapper on the DRIVER
that builds a one-row DataFrame per request and runs the same compiled
pipeline the batch path runs — no extra dependency (FastAPI/uvicorn aren't
in this environment), no change to any Spark plan, and the batch/serving
results are identical by construction because they share ``run_pipeline``.

Serving a 100 TB engine this way is correct precisely because the serving
path is one record: the request cost is dominated by the LLM call (or is
sub-millisecond with MockLlm), not by Spark overheads, and anything
heavier belongs in the batch/streaming planes.

Endpoints (JSON in/out):

- ``GET  /ping``        -> ``{"ok": true}`` after a real executor round-trip
  (L14 connection smoke test, ``session.ping``).
- ``GET  /get_models``  -> list of model names the service routes to
  (mirrors the reference's ``/get_models``).
- ``POST /pipeline/run`` -> body = one record (field -> value); returns the
  record's pipeline state: every instruction output plus the final
  ``result`` markdown and lineage ``session_id``.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from instructionspipe_spark.plans.compiler import run_pipeline
from instructionspipe_spark.plans.instructions import Pipeline
from instructionspipe_spark.plans.llm_kernel import LlmClient, MockLlm
from instructionspipe_spark.session import ping


class InvalidRecord(ValueError):
    """Client-side request error (missing/null/untyped field) -> HTTP 400."""


# Explicit JSON-scalar -> Spark type mapping. bool precedes int (bool is an
# int subclass); anything outside this table needs an input_schema.
_SCALAR_TYPES: tuple[tuple[type, T.DataType], ...] = (
    (bool, T.BooleanType()),
    (int, T.LongType()),
    (float, T.DoubleType()),
    (str, T.StringType()),
)


def _infer_field(name: str, value) -> T.StructField:
    for py_t, spark_t in _SCALAR_TYPES:
        if isinstance(value, py_t):
            return T.StructField(name, spark_t)
    if isinstance(value, list) and value and all(isinstance(v, str) for v in value):
        return T.StructField(name, T.ArrayType(T.StringType()))
    raise InvalidRecord(
        f"field {name!r} has unsupported/uninferable type "
        f"{type(value).__name__}; construct PipelineService with an explicit "
        "input_schema to accept it"
    )


class PipelineService:
    """One compiled pipeline + LLM routing table, served per-record.

    ``input_schema`` (a ``StructType``) pins the request-record schema so
    field types cannot drift from the batch plan's (int vs long vs double)
    and null values are accepted for nullable fields. Without it the schema
    is derived per request from the JSON scalars via an explicit type table
    — never ``createDataFrame``'s deprecated dict inference — and a null
    value is a 400 (its type is unknowable from one record)."""

    def __init__(
        self,
        spark: SparkSession,
        pipeline: Pipeline,
        llm: LlmClient | dict[str, LlmClient] | None = None,
        input_schema: T.StructType | None = None,
    ):
        self.spark = spark
        self.pipeline = pipeline
        self.llm = llm if llm is not None else MockLlm()
        self.input_schema = input_schema
        # Stage-0 scopes name the record fields the pipeline reads — the
        # serving contract's required fields (an empty scope means
        # "whole record", which any non-empty dict satisfies).
        self.required_fields: tuple[str, ...] = tuple(
            sorted({f for inst in (pipeline.stages[0] if pipeline.stages else ()) for f in inst.scope})
        )

    def models(self) -> list[str]:
        if isinstance(self.llm, dict):
            return sorted(self.llm)
        return [getattr(self.llm, "model", "default")]

    def _one_row_df(self, record: dict):
        missing = [f for f in self.required_fields if f not in record]
        if missing:
            raise InvalidRecord(f"missing required field(s): {', '.join(missing)}")
        if self.input_schema is not None:
            unknown = [k for k in record if k not in self.input_schema.fieldNames()]
            if unknown:
                raise InvalidRecord(
                    f"unknown field(s) not in input_schema: {', '.join(sorted(unknown))}"
                )
            null_required = [
                f.name
                for f in self.input_schema.fields
                if not f.nullable and record.get(f.name) is None
            ]
            if null_required:
                raise InvalidRecord(
                    f"non-nullable field(s) null/absent: {', '.join(null_required)}"
                )
            row = tuple(record.get(f.name) for f in self.input_schema.fields)
            return self.spark.createDataFrame([row], self.input_schema)
        null_fields = [k for k, v in record.items() if v is None]
        if null_fields:
            raise InvalidRecord(
                f"null value(s) for {', '.join(sorted(null_fields))}: a single "
                "record cannot type a null — construct PipelineService with "
                "an explicit input_schema"
            )
        # Sort field names: Spark's (deprecated) dict inference sorts keys,
        # so batch frames built from dicts have alphabetical columns — the
        # serving schema must match for lineage (session_id hashes the row
        # INCLUDING column order) to stay byte-identical to batch.
        items = sorted(record.items())
        schema = T.StructType([_infer_field(k, v) for k, v in items])
        return self.spark.createDataFrame([tuple(v for _, v in items)], schema)

    def run_record(self, record: dict) -> dict:
        """One record through the SAME compiled plan the batch path runs."""
        row = run_pipeline(self._one_row_df(record), self.pipeline, self.llm).collect()[0]
        return row.asDict(recursive=True)


class _Handler(BaseHTTPRequestHandler):
    service: PipelineService  # set by make_server

    def _send(self, code: int, payload) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        # The reference enables permissive CORS middleware; one header is
        # its stdlib equivalent for a demo/service endpoint.
        self.send_header("Access-Control-Allow-Origin", "*")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # quiet: no stderr per request
        pass

    def do_GET(self):
        if self.path == "/ping":
            self._send(200, {"ok": ping(self.service.spark)})
        elif self.path == "/get_models":
            self._send(200, self.service.models())
        else:
            self._send(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        if self.path != "/pipeline/run":
            self._send(404, {"error": f"unknown path {self.path}"})
            return
        try:
            n = int(self.headers.get("Content-Length", "0"))
            record = json.loads(self.rfile.read(n) or b"{}")
            if not isinstance(record, dict) or not record:
                raise ValueError("body must be a non-empty JSON object")
        except (ValueError, json.JSONDecodeError) as e:
            self._send(400, {"error": str(e)})
            return
        try:
            self._send(200, self.service.run_record(record))
        except InvalidRecord as e:
            self._send(400, {"error": str(e)})
        except Exception as e:  # surface, don't kill the server thread
            self._send(500, {"error": f"{type(e).__name__}: {e}"})


def make_server(service: PipelineService, host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; ``port=0`` picks a free port.
    Caller runs ``serve_forever`` (or :func:`serve_background` for tests)."""
    handler = type("BoundHandler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)


def serve_background(service: PipelineService, host: str = "127.0.0.1", port: int = 0):
    """Start the server on a daemon thread; returns (server, base_url)."""
    server = make_server(service, host, port)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, f"http://{server.server_address[0]}:{server.server_address[1]}"
