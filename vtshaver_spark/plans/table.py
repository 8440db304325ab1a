"""Iceberg-shaped snapshot table on a plain filesystem — the MERGE /
overwrite-by-filter commit contract (BASELINE.json input_hint) without
a catalog service (none runs in this container; the protocol below is
the same snapshot + atomic-pointer design, declared in SURVEY §2.3 G8).

Layout::

    table_dir/
      _current                  # JSON {"version": N} — atomic pointer
      v000001.manifest.json     # bucket id -> data dir (relative)
      snap-000001/bucket=7/...  # parquet written BY that snapshot

Every commit follows write-then-publish: stage the new snapshot's data
directories, write the next manifest, then ``os.replace`` the pointer.
A crash before the pointer swap leaves readers on the old snapshot —
no torn state, and ``read(version=k)`` time-travels to any retained
snapshot because manifests are immutable. Commits are optimistic-
concurrency safe: versions are dense and the manifest is created with
an exclusive ``open('x')``, so of two writers planning against the
same base exactly one publishes and the other raises
``ConcurrentCommitError`` (Iceberg's CAS-on-pointer contract).

Copy-on-write is PARTITION-PRUNED, the property that makes MERGE
viable at 100 TB: rows hash into ``n_buckets`` key buckets, the merge
rewrites only buckets that actually contain source keys, and the new
manifest re-references the untouched buckets' existing data
directories by path (no rewrite, no copy — exactly how Iceberg
manifests reuse unchanged data files). A merge touching 0.1% of keys
rewrites ~0.1% of the table.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BUCKET = "_bucket"


class ConcurrentCommitError(RuntimeError):
    """Another committer published this version first. The losing
    writer's staged data is untouched; retry the operation from the
    new current snapshot."""


def with_retry(commit_fn, max_attempts: int = 5):
    """Run an optimistic-commit closure until it publishes — the
    retry-from-new-snapshot loop every Iceberg writer needs, so callers
    don't hand-roll it around ``ConcurrentCommitError``.

    ``commit_fn(attempt)`` must RE-PLAN from the table's current
    snapshot on every call (read fresh state, then perform exactly one
    commit — ``merge_into`` / ``overwrite_by_filter`` / ``compact`` all
    re-read internally, so simply re-invoking them is a correct
    re-plan). A losing attempt's staged data is orphaned, never
    referenced (``vacuum`` reclaims it). Any exception other than
    ``ConcurrentCommitError`` propagates immediately; after
    ``max_attempts`` losses the last ``ConcurrentCommitError`` is
    re-raised.
    """
    if max_attempts < 1:
        # `raise last` with last=None would surface as an opaque
        # "exceptions must derive from BaseException" TypeError
        raise ValueError(f"with_retry needs max_attempts >= 1, got {max_attempts}")
    last: Optional[ConcurrentCommitError] = None
    for attempt in range(max_attempts):
        try:
            return commit_fn(attempt)
        except ConcurrentCommitError as ex:
            last = ex
    raise last


class SnapshotTable:
    """Keyed, bucketed, snapshot-versioned parquet table supporting
    ``merge_into`` (upsert), ``overwrite_by_filter`` (delete-where +
    insert), idempotent re-runs, and time travel."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_col: str,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.path = path
        self.key_col = key_col
        self.n_buckets = n_buckets

    # -- commit protocol ----------------------------------------------------
    def _pointer(self) -> str:
        return os.path.join(self.path, "_current")

    def current_version(self) -> int:
        try:
            with open(self._pointer()) as f:
                return int(json.load(f)["version"])
        except FileNotFoundError:
            return 0

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, f"v{version:06d}.manifest.json")

    def _manifest(self, version: Optional[int] = None) -> dict:
        version = self.current_version() if version is None else version
        if version == 0:
            raise FileNotFoundError(f"table {self.path} has no snapshot")
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def _publish(self, buckets: dict, base_version: Optional[int] = None) -> int:
        """Write manifest vN+1 then atomically swap the pointer. The
        staged data is already on disk; everything before the final
        ``os.replace`` is invisible to readers.

        Optimistic concurrency (Iceberg-style CAS on the commit): the
        manifest is created with ``open(..., 'x')``, so if another
        committer already published version N+1 against the same base
        the exclusive create raises and THIS commit loses — instead of
        the pre-r4 behavior where the second ``open('w')`` clobbered
        the first manifest and the pointer swap silently dropped the
        winner's buckets. ``base_version`` is the version the caller
        read when it planned the commit; versions are dense, so the
        exclusive create of v(base+1) is exactly compare-and-swap on
        the pointer."""
        base = self.current_version() if base_version is None else base_version
        version = base + 1
        manifest = {
            "version": version,
            "key_col": self.key_col,
            "n_buckets": self.n_buckets,
            "buckets": {str(b): p for b, p in sorted(buckets.items())},
        }
        try:
            with open(self._manifest_path(version), "x") as f:
                json.dump(manifest, f)
        except FileExistsError:
            raise ConcurrentCommitError(
                f"version {version} of table {self.path} was already "
                f"committed by another writer (base {base} is stale); "
                "re-read the table and retry"
            ) from None
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version}, f)
        os.replace(tmp, self._pointer())
        return version

    # -- I/O ----------------------------------------------------------------
    def _bucket_col(self):
        return F.pmod(F.xxhash64(F.col(self.key_col)), F.lit(self.n_buckets))

    def _write_buckets(self, df: DataFrame, snap_name: str, buckets) -> dict:
        """Stage the given buckets' rows under ``snap_name``; returns
        {bucket: relative data dir}. One partitioned write — each
        bucket lands in its own directory."""
        staged = {}
        out = os.path.join(self.path, snap_name)
        (
            df.withColumn(_BUCKET, self._bucket_col())
            .filter(F.col(_BUCKET).isin([int(b) for b in buckets]))
            .write.mode("overwrite")
            .partitionBy(_BUCKET)
            .parquet(out)
        )
        for b in buckets:
            bdir = os.path.join(out, f"{_BUCKET}={int(b)}")
            if os.path.isdir(bdir):
                staged[int(b)] = os.path.relpath(bdir, self.path)
        return staged

    def _read_buckets(self, bucket_dirs: list) -> DataFrame:
        paths = [os.path.join(self.path, p) for p in bucket_dirs]
        # mergeSchema: after an evolving merge, pre-evolution bucket
        # dirs lack the new columns; without footer merging the read
        # schema would depend on file enumeration order (the new
        # columns silently dropped when an old file is sampled first).
        # Missing columns read as NULL — Iceberg's add-column contract.
        return self.spark.read.option("mergeSchema", "true").parquet(*paths)

    def create(self, df: DataFrame) -> int:
        """First snapshot from a full DataFrame. Refuses to run on a
        table that already has snapshots: re-creating in place would
        overwrite data directories still referenced by live manifests
        (torn reads, corrupted time travel) — truncate-and-reload is
        ``overwrite_by_filter('true', df)``, which stages under a NEW
        snapshot directory like every other commit."""
        os.makedirs(self.path, exist_ok=True)
        if os.path.exists(self._pointer()):
            raise FileExistsError(
                f"table {self.path} already exists (current version "
                f"{self.current_version()}); use merge_into or "
                "overwrite_by_filter instead of create"
            )
        base = self.current_version()
        all_buckets = list(range(self.n_buckets))
        staged = self._write_buckets(df, f"snap-{base + 1:06d}", all_buckets)
        return self._publish(staged, base)

    def read(self, version: Optional[int] = None) -> DataFrame:
        """The table at ``version`` (default: current). Manifests are
        immutable, so old versions stay readable until vacuumed."""
        man = self._manifest(version)
        return self._read_buckets(list(man["buckets"].values()))

    # -- MERGE --------------------------------------------------------------
    def merge_into(
        self, source: DataFrame, allow_schema_evolution: bool = False
    ) -> int:
        """MERGE ON key: matched target rows take the source row
        (update), unmatched source rows insert, other target rows are
        untouched — Iceberg MERGE semantics, copy-on-write.

        Only buckets containing source keys rewrite; the new manifest
        re-references every other bucket's existing data directory.
        Idempotent: merging the same source twice produces the same
        row set (the second merge rewrites the same buckets to the
        same content). The source must be key-unique (enforced here —
        a multi-match MERGE is an error in Iceberg/ANSI too).

        ``allow_schema_evolution=True`` accepts a source whose column
        set differs from the table's (Iceberg add-column): the merged
        buckets union by name with missing columns as NULL, untouched
        buckets keep their old files, and ``read()``'s footer merge
        surfaces the widened schema table-wide (old rows read NULL in
        the new columns). Left False, a mismatched source raises —
        schema drift should be an explicit decision, not an accident.
        """
        man = self._manifest()
        src = source.withColumn(_BUCKET, self._bucket_col()).cache()
        try:
            dup = (
                src.groupBy(self.key_col).count().filter(F.col("count") > 1).count()
            )
            if dup:
                raise ValueError(
                    f"MERGE source has {dup} duplicate keys on {self.key_col!r}"
                )
            affected = sorted(
                r[_BUCKET] for r in src.select(_BUCKET).distinct().collect()
            )
            if not affected:
                return self.current_version()
            base = self.current_version()
            version = base + 1
            snap_name = f"snap-{version:06d}"

            # current rows of ONLY the affected buckets, minus keys the
            # source replaces, plus all source rows (update ∪ insert)
            existing_dirs = [
                man["buckets"][str(b)] for b in affected if str(b) in man["buckets"]
            ]
            src_data = src.drop(_BUCKET)
            if existing_dirs:
                tgt = self._read_buckets(existing_dirs)
                keep = tgt.join(
                    src_data.select(self.key_col), on=self.key_col, how="left_anti"
                )
                merged = keep.unionByName(
                    src_data, allowMissingColumns=allow_schema_evolution
                )
            else:
                merged = src_data
            staged = self._write_buckets(merged, snap_name, affected)

            buckets = {int(b): p for b, p in man["buckets"].items()}
            # an affected bucket with NO surviving rows drops from the
            # manifest entirely (delete-only merge of a whole bucket)
            for b in affected:
                buckets.pop(int(b), None)
            buckets.update(staged)
            return self._publish(buckets, base)
        finally:
            src.unpersist()

    def overwrite_by_filter(
        self, predicate_sql: str, replacement: Optional[DataFrame] = None
    ) -> int:
        """Iceberg's overwrite contract: atomically delete every row
        matching ``predicate_sql`` and insert ``replacement`` (None =
        pure delete-where). The rewrite is pruned to buckets that
        contain matching rows or replacement keys."""
        man = self._manifest()
        tgt_all = self.read().withColumn(_BUCKET, self._bucket_col())
        affected_rows = tgt_all.filter(F.expr(predicate_sql))
        affected = {
            r[_BUCKET] for r in affected_rows.select(_BUCKET).distinct().collect()
        }
        if replacement is not None:
            repl = replacement.withColumn(_BUCKET, self._bucket_col())
            affected |= {
                r[_BUCKET] for r in repl.select(_BUCKET).distinct().collect()
            }
        affected = sorted(int(b) for b in affected)
        if not affected:
            return self.current_version()
        base = self.current_version()
        version = base + 1

        existing_dirs = [
            man["buckets"][str(b)] for b in affected if str(b) in man["buckets"]
        ]
        parts = []
        if existing_dirs:
            # SQL DELETE-WHERE removes only rows where the predicate IS
            # TRUE; under three-valued logic ~NULL is NULL, so a bare
            # negated filter would silently drop NULL-evaluating rows
            # too. coalesce(pred, false) keeps them — matching the
            # affected-bucket detection above, which already treats
            # NULL as non-matching.
            parts.append(
                self._read_buckets(existing_dirs).filter(
                    ~F.coalesce(F.expr(predicate_sql), F.lit(False))
                )
            )
        if replacement is not None:
            parts.append(replacement)
        if parts:
            new_rows = parts[0]
            for p in parts[1:]:
                new_rows = new_rows.unionByName(p)
        else:
            new_rows = self.read().limit(0)
        staged = self._write_buckets(new_rows, f"snap-{version:06d}", affected)

        buckets = {int(b): p for b, p in man["buckets"].items()}
        for b in affected:
            buckets.pop(int(b), None)
        buckets.update(staged)
        return self._publish(buckets, base)

    # -- maintenance --------------------------------------------------------
    def compact(self, min_files: int = 2) -> int:
        """Rewrite fragmented buckets into one file each — Iceberg's
        ``rewrite_data_files`` as a normal CAS-protected commit.

        Many small commits (streaming upserts, per-batch merges) leave
        each bucket directory holding one parquet file per historical
        write task; at scale the footer/open overhead dominates scans.
        Buckets whose directory holds >= ``min_files`` data files are
        re-read and rewritten via ``repartition(n, _bucket)`` — every
        surviving bucket lands in exactly one shuffle partition, hence
        one file; buckets already compact are re-referenced untouched
        (no data movement, same manifest-reuse path as MERGE). Row set
        is bit-identical; readers on old snapshots are unaffected
        until ``vacuum``. Returns the new version (current version if
        nothing to compact)."""
        man = self._manifest()
        frag = []
        for b, rel in man["buckets"].items():
            full = os.path.join(self.path, rel)
            n = sum(
                1 for f in os.listdir(full)
                if f.endswith(".parquet") and not f.startswith("_")
            )
            if n >= min_files:
                frag.append(int(b))
        if not frag:
            return self.current_version()
        frag.sort()
        base = self.current_version()
        rows = self._read_buckets(
            [man["buckets"][str(b)] for b in frag]
        ).repartition(len(frag), self._bucket_col())
        staged = self._write_buckets(rows, f"snap-{base + 1:06d}", frag)
        buckets = {int(b): p for b, p in man["buckets"].items()}
        buckets.update(staged)
        return self._publish(buckets, base)

    def vacuum(self, keep_last: int = 1) -> list:
        """Drop snapshot data directories unreachable from the last
        ``keep_last`` manifests (old manifests are removed too).
        Returns the deleted snapshot dir names."""
        current = self.current_version()
        keep_versions = [v for v in range(current - keep_last + 1, current + 1) if v >= 1]
        live = set()
        for v in keep_versions:
            for p in self._manifest(v)["buckets"].values():
                live.add(p.split(os.sep)[0])
        deleted = []
        for name in sorted(os.listdir(self.path)):
            full = os.path.join(self.path, name)
            if name.startswith("snap-") and os.path.isdir(full) and name not in live:
                shutil.rmtree(full)
                deleted.append(name)
            if name.endswith(".manifest.json"):
                v = int(name[1:7])
                if v not in keep_versions:
                    os.remove(full)
        return deleted
