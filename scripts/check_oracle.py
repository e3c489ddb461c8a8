#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (driver-side tooling;
NOT part of the engine). Usage:
  python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>
For each query dir under verify_out: read the Spark parquet, run the oracle
SQL in DuckDB over the sf parquet tables, sort columns by name + rows, and
compare values exactly."""
import sys, json, math, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df):
    # sort columns by name, then rows by everything (stringified, stable)
    df = df[sorted(df.columns)]
    rows = []
    for t in df.itertuples(index=False):
        rows.append(tuple(norm(v) for v in t))
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    try:
        import pandas as pd
        if v is pd.NaT:
            return None
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
    except Exception:
        pass
    import datetime, decimal
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return tuple(norm(x) for x in v)
        if isinstance(v, np.floating):
            return repr(float(v))
        if isinstance(v, np.integer):
            return int(v)
    except Exception:
        pass
    return v

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    results = {}
    for qdir in sorted(glob.glob(os.path.join(outdir, "q_*"))):
        name = os.path.basename(qdir)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        if name not in oracles:
            results[name] = f"rows-only ({len(got)} rows)"
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e}"
            continue
        if sorted(got.columns) != sorted(want.columns):
            results[name] = f"SCHEMA MISMATCH spark={sorted(got.columns)} duck={sorted(want.columns)}"
            continue
        g, w = canon(got), canon(want)
        if len(g) != len(w):
            results[name] = f"ROWCOUNT MISMATCH spark={len(g)} duck={len(w)}"
        elif g == w:
            results[name] = f"OK ({len(g)} rows)"
        else:
            bad = [i for i, (a, b) in enumerate(zip(g, w)) if a != b][:3]
            diffs = [(g[i], w[i]) for i in bad]
            results[name] = f"VALUE MISMATCH at rows {bad}: {diffs}"
    nok = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("rows-only"))
    for k, v in results.items():
        flag = "  " if v.startswith("OK") or v.startswith("rows-only") else "XX"
        print(f"{flag} {k}: {v[:400]}")
    print(f"\n{nok}/{len(results)} pass")
    return 0 if nok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
