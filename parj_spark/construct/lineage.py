"""Per-stage lineage + counters: the resume/checkpoint contract.

Every pipeline stage writes its output as a parquet table (the checkpoint)
and appends one JSON line to ``<out>/_lineage.jsonl`` with row counters and
wall time. Resume = skip stages whose parquet already committed
(`_SUCCESS` marker — Spark's atomic commit protocol), mirroring the
north_rule's "resumable from per-partition checkpoints with lineage +
metrics". On a cluster the same layout works on any Hadoop-compatible FS;
the lineage file would become an Iceberg/Delta table, kept as JSONL here
because the sandbox has no lakehouse jars (SURVEY.md §7.0).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


def lineage_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage.jsonl")


def stage_done(stage_dir: str) -> bool:
    return os.path.exists(os.path.join(stage_dir, "_SUCCESS"))


def record_stage(
    out_dir: str,
    stage: str,
    rows_in: int | None,
    rows_out: int | None,
    wall_sec: float,
    **extra: Any,
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    row = {
        "stage": stage,
        "rows_in": rows_in,
        "rows_out": rows_out,
        "wall_sec": round(wall_sec, 3),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        **extra,
    }
    with open(lineage_path(out_dir), "a") as f:
        f.write(json.dumps(row) + "\n")


def read_lineage(out_dir: str) -> list[dict]:
    path = lineage_path(out_dir)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
