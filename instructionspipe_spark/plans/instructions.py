"""Instruction config model.

Faithful to the reference's pydantic ``Instruction``
(``src/python/instructionspipe/instructions.py:18-48``: name, input_desc,
output_desc, output_fmt, content, role, examples, knowledge, scope, model)
but as stdlib dataclasses — the runtime fields (msgs, finished, stage,
session_id) are not config here; lineage is data, produced by the compiler.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Instruction:
    """One named LLM instruction applied to a scope of input fields."""

    name: str
    scope: tuple[str, ...] = ()
    content: str | None = None
    role: str | None = None
    input_desc: str | None = None
    output_desc: str | None = None
    output_fmt: str | None = None
    examples: tuple[str, ...] = ()
    knowledge: tuple[str, ...] = ()
    model: str | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "Instruction":
        return cls(
            name=d["name"],
            scope=tuple(d.get("scope") or ()),
            content=d.get("content"),
            role=d.get("role"),
            input_desc=d.get("input_desc"),
            output_desc=d.get("output_desc"),
            output_fmt=d.get("output_fmt"),
            examples=tuple(d.get("examples") or ()),
            knowledge=tuple(d.get("knowledge") or ()),
            model=d.get("model"),
        )


@dataclass(frozen=True)
class Pipeline:
    """Stages of instructions — stage 0 maps over record fields, each later
    stage's scope names outputs of the previous stage (the reference ships
    exactly [map, reduce]; chained MRs generalize for free here)."""

    stages: tuple[tuple[Instruction, ...], ...] = field(default_factory=tuple)

    @classmethod
    def from_dict(cls, d: dict) -> "Pipeline":
        stages = tuple(
            tuple(Instruction.from_dict(i) for i in stage) for stage in d["pipe"]
        )
        return cls(stages=stages)


def load_pipeline(path: str) -> Pipeline:
    """Load a pipeline config JSON (shape: {"pipe": [[instr...], [instr...]]},
    the reference's demo_configs/mapreduce_summ/ehr.json layout).

    ``pipe`` may also be a STRING path to a JSON file holding the stage
    list (the reference's indirection, ``inf.py:40-41`` — its ehr_v1.json
    points at ehr_instructions.json). The reference resolves the path
    against the process CWD; that is honored first, with a fallback
    resolution against the config file's own directory so a shipped
    config+instructions pair loads from anywhere."""
    import os

    with open(path) as f:
        d = json.load(f)
    if isinstance(d.get("pipe"), str):
        ref = d["pipe"]
        cfg_dir = os.path.dirname(os.path.abspath(path))
        # Resolution order: CWD (the reference's behavior), then the FULL
        # relative path against the config's own directory (so
        # "pipes/instr.json" finds config_dir/pipes/instr.json), then the
        # bare basename as a last resort for configs shipped flat next to
        # their instruction file.
        candidates = (
            ref,
            os.path.join(cfg_dir, ref),
            os.path.join(cfg_dir, os.path.basename(ref)),
        )
        candidate = next((c for c in candidates if os.path.exists(c)), None)
        if candidate is None:
            raise FileNotFoundError(
                f"pipe config {ref!r} not found (tried CWD, {cfg_dir!r} "
                f"relative, and basename fallback)"
            )
        with open(candidate) as f:
            d = dict(d, pipe=json.load(f))
    return Pipeline.from_dict(d)


def load_pipelines(path: str) -> tuple[Pipeline, ...]:
    """S5 directory mode (reference inf.py:90-102): a DIRECTORY loads every
    ``*.json`` under it as one pipeline each (sorted by filename for a
    deterministic run order — the reference uses ``os.listdir`` order, which
    is filesystem-dependent); a FILE loads exactly one. Non-``.json``
    entries are skipped."""
    import os

    if not os.path.isdir(path):
        return (load_pipeline(path),)
    names = sorted(n for n in os.listdir(path) if n.endswith(".json"))
    if not names:
        raise FileNotFoundError(f"no *.json pipeline configs under directory {path}")
    return tuple(load_pipeline(os.path.join(path, n)) for n in names)
