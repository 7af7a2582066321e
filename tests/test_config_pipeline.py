"""Golden test: JSON config -> Pipeline -> DataFrame plan, mirroring the
reference's demo config shape (demo_configs/mapreduce_summ/ehr.json: a
"pipe" of [map_conf, reduce_conf] instruction lists — SURVEY.md §3.1)."""

from __future__ import annotations

import json

from instructionspipe_spark.plans.compiler import run_pipeline
from instructionspipe_spark.plans.instructions import load_pipeline
from instructionspipe_spark.plans.llm_kernel import MockLlm

# Same structure as the reference's EHR config, content our own: two map
# instructions over record fields, one reduce over the map outputs.
CONFIG = {
    "pipe": [
        [
            {
                "name": "medication_history",
                "scope": ["encounters", "labs"],
                "role": "clinical summarizer",
                "content": "Summarize the medication history.",
                "output_fmt": "markdown",
            },
            {
                "name": "allergies",
                "scope": ["notes"],
                "content": "List known allergies.",
            },
        ],
        [
            {
                "name": "summary",
                "scope": ["medication_history", "allergies"],
                "role": "editor",
                "content": "Merge into a patient summary.",
            }
        ],
    ]
}


def test_config_roundtrip_and_run(spark, tmp_path):
    path = tmp_path / "config.json"
    path.write_text(json.dumps(CONFIG))
    pipe = load_pipeline(str(path))
    assert len(pipe.stages) == 2
    assert [i.name for i in pipe.stages[0]] == ["medication_history", "allergies"]
    assert pipe.stages[1][0].scope == ("medication_history", "allergies")

    records = spark.createDataFrame(
        [
            (1, "visit 2024-01-01: prescribed X", "lab ok", "allergic to penicillin"),
            (2, "visit 2024-02-02: prescribed Y", None, ""),
        ],
        ["patient_id", "encounters", "labs", "notes"],
    )
    out = run_pipeline(records, pipe, MockLlm())
    rows = {r["patient_id"]: r for r in out.collect()}
    # map outputs exist wherever scope had valid content
    assert rows[1]["medication_history"] is not None
    assert rows[1]["allergies"] is not None
    # patient 2: notes is semantic-null "" -> allergies skipped (P6)
    assert rows[2]["allergies"] is None
    assert rows[2]["medication_history"] is not None
    # reduce consumed the map outputs of the same row; final markdown report
    assert rows[1]["result"] == f"# summary\n{rows[1]['summary']}"
    # lineage stamp is stable and content-addressed
    assert rows[1]["session_id"] != rows[2]["session_id"]
    again = {r["patient_id"]: r["session_id"] for r in run_pipeline(records, pipe, MockLlm()).collect()}
    assert again[1] == rows[1]["session_id"]
