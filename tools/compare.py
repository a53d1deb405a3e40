#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
oracle SQL from oracle_sql.json in DuckDB against the sfDir parquet tables,
sorts columns by name, and compares values row by row. Prints PASS/FAIL per
query with a diff sample on mismatch.

Dev tooling only — not part of the shipped library (the library is
Scala/Spark; this mirrors what the driver's harness does so mismatches are
caught before the round boundary).
"""
import sys, os, json, glob
import duckdb

def canon(v):
    if isinstance(v, float):
        # match on repr of doubles; NaN canonicalized
        if v != v:
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)

def table_rows(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = rel.fetchall()
    return [tuple(canon(r[i]) for i in order) for r in rows], [cols[i] for i in order]

def rel_types(rel):
    """name -> normalized DuckDB logical type string, read from relation
    METADATA (rel.types) — no second query execution (the .arrow() form
    re-ran every oracle, doubling the gate's cost on the heavy n-gram
    CTEs). Timestamp tz is stripped (Spark parquet stamps
    isAdjustedToUTC; DuckDB TIMESTAMP does not — the driver's hash is
    tz-agnostic there; its reds were bit-WIDTH and decimal-vs-int skews,
    which the logical type string preserves: INTEGER vs BIGINT vs
    HUGEINT vs UINTEGER vs DECIMAL(p,s))."""
    out = {}
    for name, t in zip(rel.columns, rel.types):
        s = str(t).replace(" WITH TIME ZONE", "")
        out[name] = s
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_noracle = 0
    for path in sorted(glob.glob(os.path.join(out_dir, "*/"))):
        name = os.path.basename(path.rstrip("/"))
        files = glob.glob(os.path.join(path, "*.parquet"))
        if not files:
            print(f"EMPTY   {name} (no parquet written)"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM read_parquet('{path}*.parquet')")
        if name not in oracle:
            print(f"NOORCL  {name} rows={len(got.fetchall())}"); n_noracle += 1; continue
        try:
            exp = con.sql(oracle[name])
        except Exception as e:
            print(f"ORCLERR {name}: {e}"); n_fail += 1; continue
        g_rows, g_cols = table_rows(got)
        e_rows, e_cols = table_rows(exp)
        if g_cols != e_cols:
            print(f"SCHEMA  {name}: spark={g_cols} duckdb={e_cols}"); n_fail += 1; continue
        # driver-strength type gate: logical-schema equality (bit width,
        # decimal-vs-int) — python repr compare is blind to these and the
        # r14 driver reds (int64 vs decimal128(38,0) dl, int32 vs int64
        # dim) were exactly this class
        g_t = rel_types(got)
        e_t = rel_types(exp)
        skew = {c: (g_t[c], e_t[c]) for c in g_t if g_t[c] != e_t.get(c, g_t[c])}
        if skew:
            print(f"TYPESKEW {name}: {skew}"); n_fail += 1; continue
        if g_rows == e_rows:
            print(f"PASS    {name} rows={len(g_rows)}"); n_pass += 1
        else:
            print(f"FAIL    {name}: spark_rows={len(g_rows)} duckdb_rows={len(e_rows)}")
            for i, (a, b) in enumerate(zip(g_rows, e_rows)):
                if a != b:
                    print(f"  first diff at row {i} (cols {g_cols}):")
                    print(f"    spark : {a}")
                    print(f"    duckdb: {b}")
                    break
            if len(g_rows) != len(e_rows):
                only_g = set(g_rows) - set(e_rows)
                only_e = set(e_rows) - set(g_rows)
                print(f"  only_spark={list(only_g)[:2]} only_duckdb={list(only_e)[:2]}")
            n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noracle} no-oracle ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
