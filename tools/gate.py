#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/gate.py <verify_out_dir> <sf_dir> [only_prefix,...]

Reads <verify_out_dir>/oracle_sql.json, registers the sf parquet tables in
DuckDB, runs each oracle SQL, and compares against the Spark parquet dump at
<verify_out_dir>/<name>/: row count, column-name set, and a hash of all values
with columns sorted by name and rows sorted by all columns.
"""
import sys, os, json, glob, hashlib
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm_cell(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if v != v: return "NaN"
        # float32 columns (duckdb list_cosine_similarity etc.) widen with
        # noise vs Spark's doubles; the catalog rounds to 4 digits, so 6 here
        # stays strictly tighter while absorbing the widening
        return f"{round(v, 6):.10g}"
    if isinstance(v, bool): return str(int(v))
    return str(v)

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
    """The r12 lesson: DuckDB types bare sum() as HUGEINT, which pandas/Arrow
    render as float64 ('5.0' vs BIGINT '5') — flipping any type- or
    format-sensitive driver hash while fetchall() (both Python int) passes.
    Fail on any HUGEINT oracle output column, and on any int-vs-float kind
    mismatch between the oracle result and the Spark parquet dump."""
    errs = [f"oracle col {c} is {t} (un-CAST aggregate?)"
            for c, t in zip(o_cols, o_types) if "HUGEINT" in str(t).upper()]
    smap = dict(zip(s_cols, s_types))
    for c, t in zip(o_cols, o_types):
        if c in smap and {type_kind(smap[c]), type_kind(t)} == {"int", "float"}:
            errs.append(f"col {c} kind mismatch spark={smap[c]} oracle={t}")
    return errs


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for l in lines: h.update(l.encode()); h.update(b"\n")
    return h.hexdigest()

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    results, fails = {}, 0
    for name in sorted(oracle):
        if only and not any(name.startswith(p) for p in only): continue
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            results[name] = "MISSING spark dump"; fails += 1; continue
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        sq = con.sql(f"SELECT * FROM read_parquet({files!r})")
        s_cols = list(sq.columns); s_types = [str(t) for t in sq.types]
        s_rows = sq.fetchall()
        try:
            oq = con.sql(oracle[name])
            o_cols = list(oq.columns); o_types = [str(t) for t in oq.types]
            o_rows = oq.fetchall()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"; fails += 1; continue
        if sorted(s_cols) != sorted(o_cols):
            results[name] = f"SCHEMA spark={sorted(s_cols)} oracle={sorted(o_cols)}"; fails += 1; continue
        lint = type_lint(s_cols, s_types, o_cols, o_types)
        if lint:
            results[name] = "TYPE " + "; ".join(lint); fails += 1; continue
        if len(s_rows) != len(o_rows):
            results[name] = f"ROWS spark={len(s_rows)} oracle={len(o_rows)}"; fails += 1; continue
        sh, oh = table_hash(s_rows, s_cols), table_hash(o_rows, o_cols)
        if sh != oh:
            results[name] = "HASH mismatch"; fails += 1
        else:
            results[name] = "ok"
    for name, r in results.items():
        if r != "ok": print(f"{name}: {r}")
    n_ok = sum(1 for r in results.values() if r == "ok")
    print(f"== {n_ok}/{len(results)} ok, {fails} failing ==")
    if not results:
        # a filter that matches nothing must not read as a pass
        print(f"== NO QUERIES MATCHED filter {only} ==")
        sys.exit(2)
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
