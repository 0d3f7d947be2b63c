#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>
Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares: column names (sorted), row counts, and values.

The value compare is EXACT the way the driver's hash is exact: floats are
canonicalized via repr(), which distinguishes -0.0 from 0.0 (Python's ==
does not — exactly how a 27-row -0.0 divergence shipped as "parity-green"
in round 14) and makes NaN equal to NaN. Decimal results (DuckDB decimal
arithmetic) canonicalize through float first so a decimal 1.5 still equals
a double 1.5. The old isclose(1e-9) check survives only as the DIAGNOSTIC
label on failures: "rounding boundary" vs "wrong answer"."""
import sys, os, json, glob, math
from decimal import Decimal
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(tuple(v) if isinstance(v, list) else v for v in (r[i] for i in idx)))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))

def exactv(v):
    """Driver-faithful canonical form: repr for floats keeps the sign of
    zero and unifies NaN; everything else compares as-is."""
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, tuple):
        return tuple(exactv(x) for x in v)
    return v

def approx_eq(a, b):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float) or isinstance(a, Decimal) or isinstance(b, Decimal):
        try:
            return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-12)
        except (TypeError, ValueError):
            return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(approx_eq(x, y) for x, y in zip(a, b))
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        grows, gcols = got.fetchall(), [d[0] for d in got.description]
        if name not in oracle:
            print(f"SKIP {name}: rows-only ({len(grows)} rows)"); continue
        try:
            exp = con.sql(oracle[name])
            erows, ecols = exp.fetchall(), [d[0] for d in exp.description]
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: cols spark={sorted(gcols)} oracle={sorted(ecols)}"); n_fail += 1; continue
        if len(grows) != len(erows):
            print(f"FAIL {name}: rows spark={len(grows)} oracle={len(erows)}"); n_fail += 1; continue
        g, e = canon(grows, gcols), canon(erows, ecols)
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(g, e)) if exactv(x) != exactv(y)]
        if not bad:
            print(f"PASS {name} ({len(grows)} rows)"); n_pass += 1; continue
        napprox = sum(1 for _, x, y in bad if approx_eq(x, y))
        print(f"FAIL {name}: {len(bad)}/{len(g)} mismatched rows ({napprox} within 1e-9 → rounding boundary, not wrong answer)")
        for i, x, y in bad[:3]:
            print(f"   row {i}:\n     spark  ={x}\n     oracle ={y}")
        n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
