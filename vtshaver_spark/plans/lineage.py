"""Checkpointed, resumable batch execution with per-partition lineage.

North-rule requirement (BASELINE.json): jobs checkpoint every N
partition-batches to the lake, record per-partition lineage + metrics
rows, and resume idempotently.

Design (Iceberg-shaped, parquet-backed here since no catalog service
runs in this container — the commit protocol is the same
write-then-publish pattern):

 - work splits into deterministic **slices** (e.g. tile x-ranges or
   hash buckets of a key column);
 - each slice writes its output to ``out/slice=<id>/`` via dynamic
   partition overwrite (idempotent re-run: a re-executed slice
   replaces itself, never duplicates);
 - after each slice commit, a lineage row (slice id, rows out, wall
   ms, status) appends to ``<out>/_lineage`` — the manifest;
 - ``resume=True`` skips slices whose lineage row says 'ok', so a
   killed job continues where it stopped.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class SliceResult:
    slice_id: int
    rows_out: int
    wall_ms: int
    status: str


def _lineage_dir(output_dir: str) -> str:
    return os.path.join(output_dir, "_lineage")


def completed_slices(spark: SparkSession, output_dir: str) -> set:
    path = _lineage_dir(output_dir)
    if not os.path.isdir(path) or not any(
        f.endswith(".json") for f in os.listdir(path)
    ):
        return set()
    done = set()
    for fname in os.listdir(path):
        if not fname.endswith(".json"):
            continue
        with open(os.path.join(path, fname)) as f:
            rec = json.load(f)
        if rec.get("status") == "ok":
            done.add(int(rec["slice_id"]))
    return done


def _append_lineage(output_dir: str, result: SliceResult, extra: Optional[dict] = None) -> None:
    path = _lineage_dir(output_dir)
    os.makedirs(path, exist_ok=True)
    rec = {
        "slice_id": result.slice_id,
        "rows_out": result.rows_out,
        "wall_ms": result.wall_ms,
        "status": result.status,
        **(extra or {}),
    }
    # write-then-rename: a torn write never looks like a committed slice
    tmp = os.path.join(path, f".slice-{result.slice_id}.json.tmp")
    final = os.path.join(path, f"slice-{result.slice_id}.json")
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, final)


def run_sliced(
    spark: SparkSession,
    slices: Sequence,
    slice_fn: Callable[[SparkSession, object], DataFrame],
    output_dir: str,
    resume: bool = True,
) -> list:
    """Run ``slice_fn(spark, slice_spec)`` per slice, each committing to
    ``output_dir/slice=<i>`` with a lineage record. Returns SliceResults
    for slices executed this run (skipped ones excluded)."""
    os.makedirs(output_dir, exist_ok=True)
    done = completed_slices(spark, output_dir) if resume else set()
    results = []
    for i, spec in enumerate(slices):
        if i in done:
            continue
        t0 = time.perf_counter()
        df = slice_fn(spark, spec)
        target = os.path.join(output_dir, f"slice={i}")
        df.write.mode("overwrite").parquet(target)
        rows = spark.read.parquet(target).count()
        res = SliceResult(
            slice_id=i,
            rows_out=rows,
            wall_ms=int((time.perf_counter() - t0) * 1000),
            status="ok",
        )
        _append_lineage(output_dir, res, extra={"spec": str(spec)})
        results.append(res)
    return results


def read_output(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.option("basePath", output_dir).parquet(
        os.path.join(output_dir, "slice=*")
    )


def lineage_df(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.json(os.path.join(_lineage_dir(output_dir), "slice-*.json"))
