#!/usr/bin/env python3
"""Mimic of the DRIVER's correctness compare (stricter than check_oracle.py):
reads Spark output parquet with pandas/pyarrow, runs the oracle in DuckDB to
a pandas DataFrame, sorts columns by name, sort_values over all columns,
then compares the stringified cell matrices. Reports dtype mismatches and
first differing cells. Usage:
  python3 scripts/driver_mimic.py <verify_out_dir> <sf_dir> [query ...]
"""
import sys, json, os, glob
import pandas as pd
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cells(df):
    return df.astype(str)


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    npass = nfail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        try:
            sdf = load_spark(outdir, name)
            if sdf is None:
                print(f"FAIL {name}: no spark output")
                nfail += 1
                continue
            odf = con.execute(sql).df()
            s, o = canon(sdf), canon(odf)
            if list(s.columns) != list(o.columns):
                print(f"FAIL {name}: cols spark={list(s.columns)} oracle={list(o.columns)}")
                nfail += 1
                continue
            if len(s) != len(o):
                print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
                nfail += 1
                continue
            sc, oc = cells(s), cells(o)
            if sc.equals(oc):
                npass += 1
                continue
            nfail += 1
            print(f"FAIL {name}: value mismatch")
            for c in s.columns:
                if not sc[c].equals(oc[c]):
                    neq = sc[c] != oc[c]
                    i = neq.idxmax()
                    print(f"  col {c}: spark dtype={s[c].dtype} oracle dtype={o[c].dtype}")
                    print(f"    first diff row {i}: spark={sc[c][i]!r} ({type(s[c][i]).__name__})"
                          f" oracle={oc[c][i]!r} ({type(o[c][i]).__name__})")
        except Exception as e:
            nfail += 1
            print(f"FAIL {name}: EXC {type(e).__name__}: {str(e)[:300]}")
    print(f"{npass} pass, {nfail} fail")


if __name__ == "__main__":
    main()
