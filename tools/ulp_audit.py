#!/usr/bin/env python3
"""Float knife-edge audit (VERDICT r14 #8): for every round-6 double the
corpus hashes, measure how far the UNROUNDED value sits from its nearest
round-6 rounding boundary, in ulps.

Why: the engines agree on a round(x, 6) value only while x is not within
a libm-divergence of a .xxxxxx5 boundary. The r14 judge hand-measured the
bm25 scores (min 2.2e6 ulps from a boundary) and psi6 (1.4e11 ulps) to
prove the four driver-red rows were representation skew, not rounding
luck — but every testdata regeneration redraws that lottery. This script
automates the measurement corpus-wide:

  1. reads oracle_sql.json from a graft.Verify output dir,
  2. textually strips the OUTERMOST round(expr, 6) calls from each
     oracle (balanced-paren scan, second arg must be the literal 6),
  3. runs the stripped SQL in DuckDB over the sf tables,
  4. for every DOUBLE column, reports the minimum over rows of
     |frac(x*1e6) - 0.5| / 1e6 / ulp(x) — the half-boundary distance in
     units of the value's own ulp.

Anything under ULP_FLOOR (1e4) is flagged for TRIAGE — not failure. The
metric alone over-flags two immune classes, both verified on the r15
sweep (SURVEY round-15 notes):
  - exact-decimal pipelines (tpch q1/q11 money sums): the unrounded
    value is CAST(exact DECIMAL AS DOUBLE) — bit-identical on both
    engines by IEEE correct rounding, so boundary proximity is
    harmless. Large magnitudes (>= 1e9) are ALWAYS within a few ulps
    of a round-6 boundary (ulp(1e9) ~ 1.2e-7 > the 5e-7 half-step),
    so this class dominates the flag list by construction.
  - single correctly-rounded ops over exact operands (tpch q17's one
    division): both engines produce the identical double.
The real risk class is order/implementation-dependent double math
(libm, differently-associated sums — e.g. the regr_* internals): a
flagged column there should be re-quantized (coarser round,
exact-integer rank, or a decimal path) before the next testdata
regeneration redraws the lottery.

Queries whose stripped SQL fails to parse (nested/structural rounds)
are reported as SKIP. Exit code is always 0 — this is an audit report
feeding SURVEY triage, not a gate.

Usage: python3 tools/ulp_audit.py <sfDir> <verifyOutDir>
Dev tooling only — not part of the shipped library.
"""
import sys, os, json, math
import duckdb

ULP_FLOOR = 1e4


def strip_round6(sql: str) -> str:
    """Replace every round(<expr>, 6) whose second arg is the literal 6
    with (<expr>), scanning balanced parens; other round() calls and
    everything else pass through untouched."""
    low = sql.lower()
    out, i = [], 0
    while True:
        j = low.find("round(", i)
        if j < 0:
            out.append(sql[i:])
            return "".join(out)
        # must be a token start ("unround(" should not match)
        if j > 0 and (low[j - 1].isalnum() or low[j - 1] == "_"):
            out.append(sql[i:j + 6])
            i = j + 6
            continue
        # scan to the matching close paren, tracking top-level commas
        depth, k = 1, j + 6
        top_commas = []
        in_str = False
        while k < len(sql) and depth > 0:
            c = sql[k]
            if in_str:
                if c == "'":
                    in_str = False
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1:
                top_commas.append(k)
            k += 1
        if depth != 0 or len(top_commas) != 1:
            out.append(sql[i:j + 6])
            i = j + 6
            continue
        arg1 = sql[j + 6:top_commas[0]]
        arg2 = sql[top_commas[0] + 1:k - 1].strip()
        if arg2 == "6":
            # recurse into the first arg (nested round-6s)
            out.append(sql[i:j] + "(" + strip_round6(arg1) + ")")
        else:
            # the round() itself is KEPT (not the audited 6-digit grid),
            # but a round-6 nested inside its arguments must still be
            # stripped — otherwise e.g. round(round(x, 6), 2)'s inner
            # quantization silently survives and the column under-audits
            # as boundary-safe (VERDICT r15 advice)
            out.append(sql[i:j + 6] + strip_round6(sql[j + 6:k - 1]) + ")")
        i = k


def boundary_ulps(x: float) -> float:
    """Distance from x to its nearest round-6 half boundary, in ulps of x."""
    if x != x or math.isinf(x):
        return float("inf")
    s = x * 1e6
    frac = s - math.floor(s)
    dist_val = abs(frac - 0.5) / 1e6
    u = math.ulp(x) if x != 0.0 else math.ulp(1e-6)
    return dist_val / u


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    worst = []  # (ulps, query, column)
    n_cols = n_skip = 0
    for name in sorted(oracle):
        sql = oracle[name]
        stripped = strip_round6(sql)
        if stripped == sql:
            continue  # no round-6 emission — nothing to audit
        try:
            rel = con.sql(stripped)
            arrow = rel.arrow()
        except Exception as e:
            print(f"SKIP    {name}: {str(e).splitlines()[0][:120]}")
            n_skip += 1
            continue
        import pyarrow as pa
        for field in arrow.schema:
            if not pa.types.is_float64(field.type):
                continue
            col = arrow.column(field.name).to_pylist()
            vals = [boundary_ulps(v) for v in col if v is not None]
            if not vals:
                continue
            m = min(vals)
            n_cols += 1
            worst.append((m, name, field.name))
            flag = "KNIFE-EDGE" if m < ULP_FLOOR else "ok"
            print(f"{flag:10s} {name:28s} {field.name:14s} min_boundary_ulps={m:.3e}")
    worst.sort()
    print(f"\n== audited {n_cols} round-6 double columns, {n_skip} skipped ==")
    if worst:
        m, q, c = worst[0]
        print(f"== tightest: {q}.{c} at {m:.3e} ulps (floor {ULP_FLOOR:.0e}) ==")
    bad = [w for w in worst if w[0] < ULP_FLOOR]
    if bad:
        print("== columns under the triage floor (see header for immune classes): ==")
        for m, q, c in bad:
            print(f"   {q}.{c}: {m:.3e} ulps")
    sys.exit(0)


if __name__ == "__main__":
    main()
