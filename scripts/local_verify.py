#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read each query's
parquet dump from Verify, run its oracle SQL in DuckDB against the same
testdata tables, compare row counts + sorted-row hashes.

Usage: python3 scripts/local_verify.py <sfDir> <verifyOutDir> [--round4]

Default is EXACT-repr comparison (no float normalization at all) — the
same class of check as the driver's hash gate, so a value that only
matches after defensive rounding fails here too. Pass --round4 for the
old tolerant mode (round(v, 4) + -0.0 folding) when triaging.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

EXACT = "--round4" not in sys.argv


def type_kind(t):
    """Coarse numeric-kind class for the oracle-vs-spark type lint."""
    t = str(t).upper()
    if t.startswith("DECIMAL") or t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if "INT" in t:  # TINYINT..BIGINT, HUGEINT, unsigned variants
        return "int"
    if t == "BOOLEAN":
        return "bool"
    return "other"


def type_lint(s_cols, s_types, o_cols, o_types):
    """Fail on HUGEINT oracle output columns (the r12 p67/p68 root cause:
    pandas/Arrow render HUGEINT as float64, flipping a type-sensitive hash
    while fetchall() stays blind) and on int-vs-float kind mismatches."""
    errs = [f"oracle col {c} is {t} (un-CAST aggregate?)"
            for c, t in zip(o_cols, o_types) if "HUGEINT" in str(t).upper()]
    smap = dict(zip(s_cols, s_types))
    for c, t in zip(o_cols, o_types):
        if c in smap and {type_kind(smap[c]), type_kind(t)} == {"int", "float"}:
            errs.append(f"col {c} kind mismatch spark={smap[c]} oracle={t}")
    return errs


def norm_rows(rows, cols):
    # sort columns by name, then sort rows; floats compared at full repr
    # unless --round4 asked for the defensive rounding
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and not EXACT:
                v = round(v, 4)
                if v == -0.0:
                    v = 0.0
            vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return out


def main(sf_dir, out_dir):
    print(f"mode: {'exact-repr' if EXACT else 'round4 (tolerant)'}")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = list(got_rel.columns)
            got_types = [str(t) for t in got_rel.types]
            got = got_rel.fetchall()
            want_rel = con.sql(sql)
            want_cols = list(want_rel.columns)
            want_types = [str(t) for t in want_rel.types]
            want = want_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            fail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(want_cols)}")
            fail += 1
            continue
        lint = type_lint(got_cols, got_types, want_cols, want_types)
        if lint:
            print(f"FAIL {name}: TYPE " + "; ".join(lint))
            fail += 1
            continue
        g = norm_rows(got, got_cols)
        w = norm_rows(want, want_cols)
        if g == w:
            print(f"ok   {name} ({len(g)} rows)")
            ok += 1
        else:
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            gs, ws = set(g), set(w)
            for x in list(gs - ws)[:3]:
                print(f"   spark-only: {x}")
            for x in list(ws - gs)[:3]:
                print(f"   duck-only:  {x}")
            fail += 1
    # rows-only checks for queries without oracle
    import os
    for name in sorted(os.listdir(out_dir)):
        if name in oracle or not os.path.isdir(f"{out_dir}/{name}"):
            continue
        try:
            n = con.execute(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
            print(f"rows {name}: {n}")
        except Exception as e:
            print(f"FAIL {name} (rows-only): {e}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
