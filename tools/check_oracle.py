#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracle.py /tmp/verify /root/testdata/sf0.01

For each query dir under outDir: read Spark's parquet result, run the
oracle SQL from oracle_sql.json in DuckDB against the sf tables, sort
columns by name, sort rows, and compare values exactly (hash-style).
Dev tool only — not part of the Scala library.
"""
import sys, os, json, glob
import duckdb

def load_spark_result(con, qdir):
    files = glob.glob(os.path.join(qdir, "*.parquet"))
    if not files:
        return None
    return con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(outdir)):
        qdir = os.path.join(outdir, name)
        if not os.path.isdir(qdir):
            continue
        got = load_spark_result(con, qdir)
        if got is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        if name not in oracle:
            print(f"SKIP {name}: rows-only check, rows={len(got)}")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}"); n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        # exact value compare (mimic hash equality)
        mismatch = None
        for c in g.columns:
            gv, ev = g[c], e[c]
            try:
                eq = (gv.values == ev.values) | (gv.isna().values & ev.isna().values)
            except Exception:
                eq = gv.astype(str).values == ev.astype(str).values
            import numpy as np
            if not eq.all():
                i = int(np.argmin(eq))
                mismatch = (c, i, gv.iloc[i], ev.iloc[i])
                break
        if mismatch:
            c, i, gv, ev = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={gv!r} oracle={ev!r}"); n_fail += 1
        else:
            print(f"PASS {name} rows={len(g)}"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
