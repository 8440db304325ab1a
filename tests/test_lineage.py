"""Checkpoint/resume + lineage (G8): killed jobs resume idempotently."""

import os

import pytest
from pyspark.sql import functions as F

from vtshaver_spark.plans.lineage import (
    completed_slices,
    lineage_df,
    read_output,
    run_sliced,
)


def make_slice_fn(spark):
    def slice_fn(s, spec):
        lo, hi = spec
        return s.range(lo, hi).withColumn("v", F.col("id") * 2)

    return slice_fn


SLICES = [(0, 100), (100, 250), (250, 300), (300, 420)]


def test_run_resume_idempotent(spark, tmp_path):
    out = str(tmp_path / "job")
    fn = make_slice_fn(spark)

    # partial run: only the first two slices "survive the crash"
    results = run_sliced(spark, SLICES[:2], fn, out, resume=True)
    assert [r.slice_id for r in results] == [0, 1]
    assert completed_slices(spark, out) == {0, 1}

    # resume with the full slice list: only 2, 3 execute
    results2 = run_sliced(spark, SLICES, fn, out, resume=True)
    assert [r.slice_id for r in results2] == [2, 3]

    # re-running again is a no-op
    assert run_sliced(spark, SLICES, fn, out, resume=True) == []

    # output equals a single-shot run
    total = read_output(spark, out)
    assert total.count() == 420
    assert total.select(F.sum("v")).collect()[0][0] == sum(2 * i for i in range(420))

    lin = lineage_df(spark, out)
    rows = {r["slice_id"]: r for r in lin.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert all(r["status"] == "ok" and r["rows_out"] > 0 for r in rows.values())


def test_rerun_slice_overwrites_not_duplicates(spark, tmp_path):
    out = str(tmp_path / "job2")
    fn = make_slice_fn(spark)
    run_sliced(spark, SLICES[:1], fn, out, resume=True)
    # force re-execution of slice 0 (resume=False) — overwrite, no dupes
    run_sliced(spark, SLICES[:1], fn, out, resume=False)
    assert read_output(spark, out).count() == 100
