"""Snapshot-table commit protocol: MERGE, overwrite-by-filter,
write-then-publish atomicity, partition-pruned copy-on-write, time
travel (plans/table.py — the Iceberg-shaped G8 contract)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from vtshaver_spark.plans.table import ConcurrentCommitError, SnapshotTable


def _rows(df):
    return {
        (r["k"], r["val"]) for r in df.select("k", "val").collect()
    }


@pytest.fixture
def table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"), key_col="k", n_buckets=4)
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "k long, val string"
    )
    assert t.create(base) == 1
    return t


def test_merge_upsert_semantics(spark, table):
    src = spark.createDataFrame(
        [(3, "updated3"), (7, "updated7"), (100, "new100")], "k long, val string"
    )
    v = table.merge_into(src)
    assert v == 2
    got = _rows(table.read())
    assert (3, "updated3") in got and (7, "updated7") in got
    assert (100, "new100") in got
    assert (3, "v3") not in got
    # untouched rows survive
    assert (0, "v0") in got and len(got) == 21


def test_merge_is_partition_pruned(spark, table):
    # a single-key merge must rewrite only that key's bucket: every
    # other bucket's manifest entry still points at snapshot 1's data
    src = spark.createDataFrame([(3, "x")], "k long, val string")
    table.merge_into(src)
    man = table._manifest()
    reused = [p for p in man["buckets"].values() if p.startswith("snap-000001")]
    rewritten = [p for p in man["buckets"].values() if p.startswith("snap-000002")]
    assert len(rewritten) == 1
    assert len(reused) == len(man["buckets"]) - 1


def test_merge_idempotent_rerun(spark, table):
    src = spark.createDataFrame(
        [(1, "u1"), (50, "n50")], "k long, val string"
    )
    table.merge_into(src)
    first = _rows(table.read())
    table.merge_into(src)  # e.g. a retried driver re-running its slice
    assert _rows(table.read()) == first


def test_merge_rejects_duplicate_source_keys(spark, table):
    src = spark.createDataFrame(
        [(1, "a"), (1, "b")], "k long, val string"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        table.merge_into(src)


def test_crash_before_publish_leaves_old_snapshot(spark, table):
    """Write-then-publish: staged data without the pointer swap is
    invisible — simulate the crash by staging a snapshot dir and a
    manifest WITHOUT swapping _current."""
    before = _rows(table.read())
    # stage garbage the way a dying merge would
    staged = table._write_buckets(
        spark.createDataFrame([(3, "torn")], "k long, val string"),
        "snap-000099",
        [0, 1, 2, 3],
    )
    with open(table._manifest_path(99), "w") as f:
        json.dump({"version": 99, "buckets": {str(b): p for b, p in staged.items()},
                   "key_col": "k", "n_buckets": 4}, f)
    # pointer untouched -> readers see the old table
    assert table.current_version() == 1
    assert _rows(table.read()) == before


def test_overwrite_by_filter(spark, table):
    repl = spark.createDataFrame(
        [(200, "r200"), (201, "r201")], "k long, val string"
    )
    table.overwrite_by_filter("k >= 10", replacement=repl)
    got = _rows(table.read())
    assert not any(10 <= k < 100 for k, _ in got)
    assert (200, "r200") in got and (201, "r201") in got
    assert (5, "v5") in got
    # pure delete-where
    table.overwrite_by_filter("k = 5")
    assert (5, "v5") not in _rows(table.read())


def test_time_travel_and_vacuum(spark, table):
    v1 = _rows(table.read(version=1))
    table.merge_into(
        spark.createDataFrame([(0, "mutated")], "k long, val string")
    )
    assert _rows(table.read(version=1)) == v1  # old snapshot intact
    assert (0, "mutated") in _rows(table.read())
    deleted = table.vacuum(keep_last=1)
    # snapshot 1's dirs are still partly LIVE (reused buckets), so
    # vacuum must not delete them; only fully-unreachable dirs go
    assert "snap-000001" not in deleted
    assert _rows(table.read()) is not None  # current still readable
    with pytest.raises(FileNotFoundError):
        table._manifest(1)  # old manifest pruned


def test_empty_merge_noop(spark, table):
    v = table.merge_into(
        spark.createDataFrame([], "k long, val string")
    )
    assert v == 1  # no new snapshot for an empty source


def test_delete_where_keeps_null_predicate_rows(spark, table):
    """SQL DELETE-WHERE removes only rows where the predicate IS TRUE:
    a row whose predicate evaluates NULL must survive (three-valued
    logic — a bare negated filter would silently drop it)."""
    table.merge_into(
        spark.createDataFrame([(500, None)], "k long, val string")
    )
    table.overwrite_by_filter("val = 'v3'")
    got = _rows(table.read())
    assert (3, "v3") not in got          # TRUE rows deleted
    assert (500, None) in got            # NULL-evaluating row survives
    assert (5, "v5") in got              # FALSE rows survive


def test_create_refuses_existing_table(spark, table):
    """Re-creating in place would overwrite data dirs still referenced
    by live manifests; create() must refuse after the first snapshot."""
    with pytest.raises(FileExistsError, match="already exists"):
        table.create(
            spark.createDataFrame([(1, "x")], "k long, val string")
        )
    assert table.current_version() == 1  # untouched


def test_concurrent_publish_loser_raises(spark, table):
    """CAS commit: two writers planning against the same base version
    cannot both publish — the second manifest create collides and
    raises instead of silently dropping the winner's buckets."""
    src_a = spark.createDataFrame([(1, "a")], "k long, val string")
    src_b = spark.createDataFrame([(2, "b")], "k long, val string")
    # simulate writer B staging concurrently: plan B's commit against
    # base 1, let A commit first, then publish B against the stale base
    base = table.current_version()
    man = table._manifest()
    staged_b = table._write_buckets(src_b, "snap-conc-b", list(range(4)))
    buckets_b = {int(k): p for k, p in man["buckets"].items()}
    buckets_b.update(staged_b)

    assert table.merge_into(src_a) == 2  # writer A wins

    with pytest.raises(ConcurrentCommitError):
        table._publish(buckets_b, base)
    # A's commit is intact
    assert (1, "a") in _rows(table.read())
    assert table.current_version() == 2


def test_merge_schema_evolution_add_column(spark, table):
    """Iceberg add-column: an evolving merge widens the table schema;
    untouched buckets' old files read NULL in the new column (footer
    merge), and a non-evolving merge with a drifted schema raises."""
    src = spark.createDataFrame(
        [(3, "updated3", 0.5), (100, "new100", 0.9)],
        "k long, val string, score double",
    )
    with pytest.raises(Exception):
        table.merge_into(src)  # drift must be explicit
    v = table.merge_into(src, allow_schema_evolution=True)
    assert v == 2
    out = table.read()
    assert set(out.columns) == {"k", "val", "score"}
    got = {(r["k"], r["val"], r["score"]) for r in out.collect()}
    assert (3, "updated3", 0.5) in got and (100, "new100", 0.9) in got
    # a row in an untouched (non-rewritten) bucket reads NULL score
    assert (0, "v0", None) in got
    # time travel to v1 still shows the pre-evolution schema
    assert set(table.read(version=1).columns) == {"k", "val"}


def test_compact_rewrites_fragmented_buckets(spark, tmp_path):
    """compact() must leave every fragmented bucket with one data
    file, preserve the exact row set, reuse already-compact buckets'
    files untouched, and commit through the same CAS-versioned path
    as MERGE. Fragmentation source: a multi-partition write scatters
    each bucket's rows across one file per writing task."""
    t = SnapshotTable(spark, str(tmp_path / "ctbl"), key_col="k", n_buckets=4)
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(40)], "k long, val string"
    ).repartition(8)
    t.create(base)
    before = _rows(t.read())
    man_before = t._manifest()

    def n_files(rel):
        full = os.path.join(t.path, rel)
        return sum(1 for f in os.listdir(full) if f.endswith(".parquet"))

    frag = {b for b, rel in man_before["buckets"].items() if n_files(rel) >= 2}
    assert frag, "fixture failed to fragment any bucket"

    v = t.compact()
    assert v == 2 == t.current_version()
    assert _rows(t.read()) == before
    man = t._manifest()
    for b, rel in man["buckets"].items():
        assert n_files(rel) == 1, (b, rel)
        if b not in frag:
            # already-compact buckets were re-referenced, not rewritten
            assert rel == man_before["buckets"][b]
    # old snapshot still readable until vacuum; nothing left -> no-op
    assert _rows(t.read(version=1)) == before
    assert t.compact() == v


def test_with_retry_rejects_non_positive_attempts():
    from vtshaver_spark.plans.table import with_retry

    import pytest as _pytest
    with _pytest.raises(ValueError, match="max_attempts"):
        with_retry(lambda a: a, max_attempts=0)


def test_with_retry_loser_replans_and_succeeds(spark, table, tmp_path):
    """with_retry around MERGE: a competing writer lands a commit
    between this writer's plan and publish (injected just before the
    first publish); attempt 0 loses with ConcurrentCommitError,
    attempt 1 re-plans from the NEW snapshot and succeeds, and the
    final table carries BOTH writers' rows."""
    from vtshaver_spark.plans.table import with_retry

    other = SnapshotTable(
        spark, table.path, key_col="k", n_buckets=table.n_buckets
    )
    other_src = spark.createDataFrame([(100, "other")], "k long, val string")
    my_src = spark.createDataFrame([(3, "mine"), (200, "mine")], "k long, val string")

    orig_publish = table._publish
    state = {"raced": False}

    def racy_publish(buckets, base_version=None):
        if not state["raced"]:
            state["raced"] = True
            other.merge_into(other_src)  # the competitor wins the CAS
        return orig_publish(buckets, base_version)

    table._publish = racy_publish
    attempts = []

    def commit(attempt):
        attempts.append(attempt)
        return table.merge_into(my_src)

    version = with_retry(commit)
    assert attempts == [0, 1]        # lost once, re-planned, won
    assert version == table.current_version() == 3  # create + other + mine
    got = _rows(table.read())
    assert (100, "other") in got and (200, "mine") in got and (3, "mine") in got
    assert (3, "v3") not in got


def test_with_retry_gives_up_after_max_attempts(spark, table):
    from vtshaver_spark.plans.table import with_retry

    def always_lose(attempt):
        raise ConcurrentCommitError("stale")

    with pytest.raises(ConcurrentCommitError):
        with_retry(always_lose, max_attempts=3)
