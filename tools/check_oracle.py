"""Local simulation of the driver's correctness gate.

Runs every queries() entry in Spark and its oracle_sql() in DuckDB at
the given scale factor, compares row counts and order-insensitive
value hashes. Usage: python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from vtshaver_spark.session import build_session
from vtshaver_spark.sources.views import BASE_TABLES


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def value_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x01".join(norm_cell(row[i]) for i in order) for row in rows
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def assert_board(artifact_path: str) -> int:
    """Fail when any registered queries() name is absent from a driver
    CORRECTNESS artifact, or any present cell is non-green — the guard
    against queries silently vanishing from the board (r4: the 51st
    registered query was dropped without an err entry)."""
    import json

    with open(artifact_path) as fh:
        board = json.load(fh)
    names = list(entry_mod.queries())
    missing = [n for n in names if n not in board]
    red = [
        n
        for n, cell in board.items()
        if not (cell.get("rows_match") and cell.get("schema_match")
                and (cell.get("hash_match") or "hash_match" not in cell))
    ]
    extra = [n for n in board if n not in names]
    print(f"registered={len(names)} on_board={len(board)}")
    if missing:
        print("MISSING from board:", missing)
    if red:
        print("RED cells:", red)
    if extra:
        print("board-only (renamed/removed queries):", extra)
    if not missing and not red:
        print("board OK: every registered query present and green")
        return 0
    return 1


def main():
    if sys.argv[1:2] == ["--assert-board"]:
        if len(sys.argv) != 3:
            # without this, the bare flag falls through and boots a
            # full Spark oracle run against a dir named --assert-board
            print("usage: check_oracle.py --assert-board CORRECTNESS_rN.json",
                  file=sys.stderr)
            return 2
        return assert_board(sys.argv[2])
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])  # optional query-name filter
    spark = build_session(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in BASE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as ex:
            print(f"{name:28s} SPARK ERROR: {ex}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"{name:28s} rows={len(srows):6d}  (rows-only, no oracle)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as ex:
            print(f"{name:28s} ORACLE ERROR: {ex}")
            failures.append(name)
            continue
        sh = value_hash([tuple(r) for r in srows], scols)
        oh = value_hash(orows, ocols)
        ok = len(srows) == len(orows) and sorted(scols) == sorted(ocols) and sh == oh
        status = "OK " if ok else "MISMATCH"
        print(
            f"{name:28s} {status} spark_rows={len(srows):6d} oracle_rows={len(orows):6d}"
            f" cols={'=' if sorted(scols) == sorted(ocols) else 'DIFF'}"
            f" hash={'=' if sh == oh else 'DIFF'}"
        )
        if not ok:
            failures.append(name)
            if sorted(scols) != sorted(ocols):
                print(f"   spark cols: {sorted(scols)}\n   oracle cols: {sorted(ocols)}")
            sset = {tuple(norm_cell(v) for v in r) for r in srows}
            oset = {tuple(norm_cell(v) for v in r) for r in orows}
            so = list(sset - oset)[:3]
            os_ = list(oset - sset)[:3]
            if so:
                print(f"   spark-only: {so}")
            if os_:
                print(f"   oracle-only: {os_}")
    print("\nFAILURES:", failures if failures else "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
