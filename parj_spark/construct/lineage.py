"""Per-stage lineage + counters: the resume/checkpoint contract.

Every pipeline stage writes its output as a parquet table (the checkpoint)
and records one JSON line with row counters and wall time. Resume = skip
stages whose parquet already committed (`_SUCCESS` marker — Spark's atomic
commit protocol), mirroring the north_rule's "resumable from per-partition
checkpoints with lineage + metrics".

Paths are resolved through the Hadoop FileSystem API whenever they carry a
scheme (s3://, hdfs://, ...), so resume and lineage work on the cluster
layouts scripts/submit_pipeline.py documents — not only on the local FS.
Object stores have no append, so remote lineage records are written as one
small JSON file per event under ``<out>/_lineage/`` instead of a JSONL; on
the local FS the single ``_lineage.jsonl`` is kept (and read_lineage merges
both forms). On a lakehouse deployment this becomes an Iceberg/Delta table;
kept as JSON here because the sandbox has no lakehouse jars (SURVEY.md §7.0).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


def _is_local(path: str) -> bool:
    return "://" not in path or path.startswith("file:")


def _strip_file_scheme(path: str) -> str:
    return path.removeprefix("file://").removeprefix("file:")


def _hadoop_fs(spark, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def path_exists(path: str, spark=None) -> bool:
    if _is_local(path):
        return os.path.exists(_strip_file_scheme(path))
    if spark is None:
        raise ValueError(f"checking {path!r} needs a SparkSession (Hadoop FS)")
    fs, hpath, _ = _hadoop_fs(spark, path)
    return fs.exists(hpath)


def touch(path: str, spark=None) -> None:
    """Create an empty marker file (atomic-enough commit witness)."""
    if _is_local(path):
        local = _strip_file_scheme(path)
        os.makedirs(os.path.dirname(local), exist_ok=True)
        with open(local, "w"):
            pass
        return
    if spark is None:
        raise ValueError(f"touching {path!r} needs a SparkSession (Hadoop FS)")
    fs, hpath, _ = _hadoop_fs(spark, path)
    out = fs.create(hpath, True)
    out.close()


def lineage_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage.jsonl")


def stage_done(stage_dir: str, spark=None) -> bool:
    return path_exists(os.path.join(stage_dir, "_SUCCESS"), spark)


def record_stage(
    out_dir: str,
    stage: str,
    rows_in: int | None,
    rows_out: int | None,
    wall_sec: float,
    spark=None,
    **extra: Any,
) -> None:
    row = {
        "stage": stage,
        "rows_in": rows_in,
        "rows_out": rows_out,
        "wall_sec": round(wall_sec, 3),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        **extra,
    }
    payload = json.dumps(row)
    if _is_local(out_dir):
        local = _strip_file_scheme(out_dir)
        os.makedirs(local, exist_ok=True)
        with open(lineage_path(local), "a") as f:
            f.write(payload + "\n")
        return
    if spark is None:
        raise ValueError(f"lineage for {out_dir!r} needs a SparkSession (Hadoop FS)")
    # no append on object stores: one file per record
    name = f"{stage}_{time.strftime('%Y%m%dT%H%M%SZ', time.gmtime())}_{os.getpid()}.json"
    fs, hpath, jvm = _hadoop_fs(spark, os.path.join(out_dir, "_lineage", name))
    out = fs.create(hpath, True)
    out.write(bytearray(payload.encode("utf-8")))
    out.close()


def read_lineage(out_dir: str, spark=None) -> list[dict]:
    if _is_local(out_dir):
        path = lineage_path(_strip_file_scheme(out_dir))
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]
    if spark is None:
        raise ValueError(f"lineage for {out_dir!r} needs a SparkSession (Hadoop FS)")
    fs, hdir, jvm = _hadoop_fs(spark, os.path.join(out_dir, "_lineage"))
    if not fs.exists(hdir):
        return []
    records = []
    for status in fs.listStatus(hdir):
        stream = fs.open(status.getPath())
        try:
            data = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()
        records.append(json.loads(data))
    return sorted(records, key=lambda r: r.get("ts", ""))


def partition_counters(stage_dir: str) -> list[dict]:
    """Per-partition row counters for a committed stage, read from the
    parquet footers (zero extra Spark jobs — the counts were written with
    the data). One dict per data file: file name, hive partition values
    parsed from the path (e.g. ``p=7``), row count, byte size.

    This is the per-partition half of the north rule's "per-partition
    checkpoints with lineage + counters": `record_stage` keeps the stage-
    level totals/wall-time, this exposes the partition grain for skew
    audits and resume verification (a partition whose footer count is 0 or
    whose file is missing pinpoints what a retry must redo). Local-FS
    implementation; on a lakehouse these counters come from the table
    format's manifest files instead.
    """
    import pyarrow.parquet as pq

    root = _strip_file_scheme(stage_dir)
    out: list[dict] = []
    for dirpath, _dirnames, filenames in sorted(os.walk(root)):
        parts = {}
        rel = os.path.relpath(dirpath, root)
        if rel != ".":
            for seg in rel.split(os.sep):
                if "=" in seg:
                    k, _, v = seg.partition("=")
                    parts[k] = v
        for fn in sorted(filenames):
            if not fn.endswith(".parquet"):
                continue
            fp = os.path.join(dirpath, fn)
            meta = pq.ParquetFile(fp).metadata
            out.append(
                {
                    "file": os.path.relpath(fp, root),
                    "partition": parts,
                    "rows": meta.num_rows,
                    "bytes": os.path.getsize(fp),
                }
            )
    return out
