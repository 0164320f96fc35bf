#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Usage:
  python3 tools/local_check.py [sfDir] [outDir] [--no-run] [query ...]

Runs `graft.Verify <sfDir> <outDir>` via sbt (unless --no-run), then for
every query with an oracle: executes the oracle SQL in DuckDB over views
named after the test tables, reads the Spark result parquet, sorts
columns by name and rows by value, and compares cell-by-cell.

This is dev tooling only — the engine itself is pure Scala/Spark.
"""
import json
import math
import subprocess
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def fetch_sorted(con, sql):
    rel = con.sql(sql)
    cols = rel.columns
    types = [str(t).upper() for t in rel.types]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(norm_cell(r[i]) for i in order) for r in rel.fetchall()]
    return [cols[i] for i in order], [types[i] for i in order], rows


INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT"}


def type_mismatch(ot, st):
    """Reason string if this oracle/spark type pair would trip the driver's
    width-sensitive hash (cells_equal coerces numerically and cannot see
    it — the round-6 HUGEINT class). DuckDB widens sum(BIGINT) and
    BIGINT*BIGINT to HUGEINT; always CAST(... AS BIGINT) in oracles."""
    if ot == st:
        return None
    if ot in INT_TYPES and st in INT_TYPES:
        return f"integer width {ot} vs {st}"
    if ot.startswith("DECIMAL") or st.startswith("DECIMAL"):
        return f"decimal vs {st if ot.startswith('DECIMAL') else ot}"
    if "HUGEINT" in (ot, st):
        return f"{ot} vs {st}"
    return None


def cells_equal(a, b):
    if a == b:
        return True
    # numeric cross-type equality only (e.g. DuckDB DECIMAL vs double) —
    # deliberately EXACT, no epsilon: the driver hash-compares, so any
    # tolerance here would hide a real failure (verified: all oracles are
    # bit-exact both sides thanks to both-sides rounding)
    try:
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    except (TypeError, ValueError):
        return False


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    no_run = "--no-run" in sys.argv
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"
    only = set(args[2:])

    if not no_run:
        sel = (" " + " ".join(sorted(only))) if only else ""
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}{sel}'],
            capture_output=True, text=True)
        sys.stdout.write(r.stdout[-3000:])
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-3000:])
            sys.exit(1)

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            ocols, otypes, orows = fetch_sorted(con, sql)
            scols, stypes, srows = fetch_sorted(
                con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        except Exception as ex:
            print(f"FAIL {name}: exec error: {str(ex)[:300]}")
            n_fail += 1
            continue
        if [c.lower() for c in ocols] != [c.lower() for c in scols]:
            print(f"FAIL {name}: columns differ oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        twarn = [(c, r) for c, ot, st in zip(ocols, otypes, stypes)
                 for r in [type_mismatch(ot, st)] if r]
        if twarn:
            for c, r in twarn:
                print(f"FAIL {name}: col {c} type: {r} (driver hash is "
                      f"width-sensitive; CAST the oracle column)")
            n_fail += 1
            continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: rowcount oracle={len(orows)} spark={len(srows)}")
            n_fail += 1
            continue
        bad = None
        o_sorted = sorted(orows, key=repr)
        s_sorted = sorted(srows, key=repr)
        for i, (orow, srow) in enumerate(zip(o_sorted, s_sorted)):
            for c, (a, b) in enumerate(zip(orow, srow)):
                if not cells_equal(a, b):
                    bad = (i, ocols[c], a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: oracle={a!r} spark={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
