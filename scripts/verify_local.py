#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
  python3 scripts/verify_local.py <sfDir> <outDir>

Reads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir
parquet tables, and compares values exactly (columns sorted by name,
rows sorted by all columns). Exit code 1 on any mismatch.

Every oracle runs under a per-row watchdog (ROW_TIMEOUT_S, override
with --row-timeout N): a row that exceeds it is interrupted and
recorded as a NAMED failure, so one pathological oracle can never eat
the whole artifact window — the round-18 lesson, where the driver's
CORRECTNESS file landed empty. Each [ok] line carries the row's oracle
wall seconds so slow rows are visible without profiling.
"""
import json
import math
import sys
import threading
import time
from pathlib import Path

import duckdb

# Generous per-row cap: the slowest honest oracle (vds lifecycle at
# sf0.1) runs well under 2 min after the round-19 ClosureSql rewrite;
# 600 s only fires on a genuinely pathological row.
ROW_TIMEOUT_S = 600.0

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    # Strict: ints and floats canonicalize to DIFFERENT tags. The driver's
    # hash is type-sensitive (round 7 regression: DuckDB HUGEINT/DOUBLE vs
    # Spark BIGINT hashed differently despite equal values), so the local
    # gate must not coerce int<->float.
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, bool):
                vals.append(("b", v))
            elif isinstance(v, float):
                if math.isnan(v):
                    vals.append(("f", "nan"))
                else:
                    vals.append(("f", repr(v)))
            elif isinstance(v, int):
                vals.append(("i", v))
            else:
                vals.append(("s", str(v)))
        out.append(tuple(vals))
    return out


# DuckDB type -> comparison family. BIGINT-and-narrower ints are one
# family (the driver reads both sides through the same integer path);
# HUGEINT, DECIMAL, and the float types are each distinct so e.g. a
# DuckDB list_sum (HUGEINT) against a Spark LONG fails loudly here,
# exactly like the driver's hash does.
def type_family(t):
    t = t.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t == "HUGEINT":
        return "hugeint"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    return t


def column_types(con, sql):
    return {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}


# Twin of graft.Verify.surfaceViolations: the driver gate can only hash
# scalar, non-DECIMAL columns (pandas sort_values chokes on arrays —
# round-10 a11 err; DECIMAL hash-splits across readers — round-10 q1d).
# ALLOWLIST, mirroring the Scala side's type whitelist — a deny-list
# would let surfaces the Scala lint rejects (e.g. BLOB from a Spark
# BinaryType column) sail into the comparator and fail with a
# misleading value-mismatch instead of a named surface failure.
SCALAR_OK = {"BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
             "FLOAT", "REAL", "DOUBLE", "VARCHAR", "DATE"}


def surface_violations(types):
    bad = []
    for c, t in types.items():
        u = t.upper()
        if u not in SCALAR_OK and not u.startswith("TIMESTAMP"):
            bad.append(f"{c}: {t}")
    return bad


def run_bounded(con, sql, timeout_s):
    """Execute with a watchdog: interrupt the query at timeout_s and
    raise. The connection survives an interrupt (tested on DuckDB
    1.0.0), so the sweep continues with the next row."""
    timer = threading.Timer(timeout_s, con.interrupt)
    timer.start()
    try:
        return con.execute(sql)
    finally:
        timer.cancel()


def main():
    # Usage: verify_local.py [--row-timeout N] <sfDir> <outDir> [name ...]
    # Optional names restrict the sweep to just those queries — the
    # fast path when iterating on one new query. The missing-result
    # manifest check only runs on the FULL sweep.
    argv = sys.argv[1:]
    row_timeout = ROW_TIMEOUT_S
    if argv and argv[0] == "--row-timeout":
        row_timeout = float(argv[1])
        argv = argv[2:]
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    failures = []
    produced = sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir())
    manifest_path = Path(out_dir, "queries.json")
    if only:
        unknown = only - set(produced)
        for name in sorted(unknown):
            failures.append((name, "requested query has no result dir"))
        produced = [n for n in produced if n in only]
        # A requested name absent from the regenerated oracle map would
        # silently downgrade to the rows-only branch (e.g. a stale result
        # dir left by a prior Verify run for a since-renamed query) — the
        # user would believe the oracle compare ran when it didn't. Fail
        # unless the manifest declares it as a known rows-only query.
        declared = (set(json.loads(manifest_path.read_text()))
                    if manifest_path.exists() else None)
        for name in sorted(set(produced) - set(oracle)):
            if declared is not None and name not in declared:
                failures.append(
                    (name, "requested name not in queries.json manifest — "
                           "stale result dir? (no oracle compare would run)"))
                produced.remove(name)
            else:
                print(f"  [warn] {name}: no oracle SQL — rows-only check "
                      f"(declared non-SQL-expressible)")
    if manifest_path.exists() and not only:
        declared = json.loads(manifest_path.read_text())
        for missing in sorted(set(declared) - set(produced)):
            failures.append((missing, "declared query produced no result "
                                      "(Spark side failed)"))
    for name in produced:
        res_glob = f"{out_dir}/{name}/*.parquet"
        try:
            spark_cols = [d[0] for d in con.execute(
                f"SELECT * FROM '{res_glob}' LIMIT 0").description]
            order = ", ".join(f'"{c}"' for c in sorted(spark_cols))
            spark_rows = con.execute(
                f"SELECT {order} FROM '{res_glob}'").fetchall()
        except Exception as e:
            failures.append((name, f"spark result unreadable: {e}"))
            continue
        try:
            lint_types = column_types(con, f"SELECT * FROM '{res_glob}'")
        except Exception as e:
            failures.append((name, f"DESCRIBE failed: {e}"))
            continue
        lint_bad = surface_violations(lint_types)
        if lint_bad:
            failures.append(
                (name, "output-surface lint: non-scalar/DECIMAL columns "
                       "the driver hash cannot take: " + "; ".join(lint_bad)))
            continue
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(spark_rows)} rows")
            if len(spark_rows) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        t0 = time.time()
        try:
            # DESCRIBE is plan-only: column names without paying for an
            # extra full execution (the pre-r19 spelling ran every
            # oracle twice)
            oracle_cols = [r[0] for r in run_bounded(
                con, f"DESCRIBE ({oracle[name]})", row_timeout).fetchall()]
            oracle_rows = run_bounded(
                con, f"SELECT {order} FROM ({oracle[name]})",
                row_timeout).fetchall()
        except duckdb.InterruptException:
            failures.append(
                (name, f"oracle exceeded --row-timeout {row_timeout:.0f}s "
                       f"(interrupted; sweep continues)"))
            continue
        except Exception as e:
            failures.append((name, f"oracle failed: {e}"))
            continue
        oracle_secs = time.time() - t0
        if sorted(spark_cols) != sorted(oracle_cols):
            failures.append(
                (name, f"schema mismatch: {sorted(spark_cols)} vs "
                       f"{sorted(oracle_cols)}"))
            continue
        try:
            spark_types = column_types(con, f"SELECT * FROM '{res_glob}'")
            oracle_types = column_types(con, f"({oracle[name]})")
        except Exception as e:
            failures.append((name, f"DESCRIBE failed: {e}"))
            continue
        type_bad = [
            f"{c}: spark {spark_types[c]} vs oracle {oracle_types[c]}"
            for c in sorted(spark_cols)
            if type_family(spark_types[c]) != type_family(oracle_types[c])]
        if type_bad:
            failures.append(
                (name, "result-type mismatch (driver hash would differ): "
                       + "; ".join(type_bad)))
            continue
        a, b = canon(spark_rows), canon(oracle_rows)
        if len(a) != len(b):
            failures.append((name, f"row count {len(a)} vs {len(b)}"))
            continue
        # compare as multisets sorted
        sa, sb = sorted(a), sorted(b)
        if sa != sb:
            bad = next(i for i, (x, y) in enumerate(zip(sa, sb)) if x != y)
            failures.append(
                (name, f"value mismatch at sorted row {bad}:\n"
                       f"    spark : {sa[bad]}\n    oracle: {sb[bad]}"))
            continue
        print(f"  [ok] {name}: {len(a)} rows ({oracle_secs:.1f}s oracle)")
    if failures:
        print(f"\n{len(failures)} FAILURES:")
        for n, msg in failures:
            print(f"  [FAIL] {n}: {msg}")
        sys.exit(1)
    print("\nall queries match")


if __name__ == "__main__":
    main()
