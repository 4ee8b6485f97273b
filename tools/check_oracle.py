#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracle.py /tmp/verify /root/testdata/sf0.01
       python3 tools/check_oracle.py --diff-digests DIR_A DIR_B

For each query dir under outDir: read Spark's parquet result, run the
oracle SQL from oracle_sql.json in DuckDB against the sf tables, sort
columns by name, sort rows, and compare values exactly (hash-style).
On mismatch, EVERY differing column is reported with its differing-row
count and (for numerics) max abs delta, and a machine-readable
oracle_report.json lands in outDir.

--diff-digests compares the _digest.json files Verify writes into two
output trees (e.g. the driver environment's vs a local run's): any
query/column whose row count, min/max, or order-independent hsum
fingerprint differs is named — the diagnosis path when the driver's
hash gate disagrees with the local oracle emulation.
Dev tool only — not part of the Scala library.
"""
import sys, os, json
import duckdb
import pyarrow.dataset as ds

def load_spark_result(con, qdir):
    # Discover files the way the DRIVER does — pyarrow dataset discovery
    # over the query DIRECTORY (which inspects every file not prefixed
    # with `_`/`.`). A stray non-parquet file in the dir must fail HERE,
    # locally, before it ships: round 5's digest.json sat invisible to a
    # *.parquet glob and zeroed all 102 driver correctness entries.
    dset = ds.dataset(qdir, format="parquet")
    files = list(dset.files)
    if not files:
        return None, None
    df = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    return df, dset.schema

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def canon_type(t, side):
    """The driver-effective dtype class of an arrow type. Calibrated
    against CORRECTNESS_r06.json, where the driver's hasher was green on
    int32-vs-int64 (q21/q22/q23/q44/q99/q127/q143), date-vs-timestamp
    (q16) and oracle-DECIMAL(3,2)-vs-spark-double (q104), yet failed
    every query whose SPARK parquet emits DECIMAL and every
    oracle-HUGEINT/DECIMAL-vs-spark-BIGINT pair. The implied conversion
    model (matches all 144 r6 outcomes): the oracle side goes through
    DuckDB's pandas conversion, which renders DECIMAL/HUGEINT as
    float64; the spark side goes through pyarrow, which keeps parquet
    DECIMAL as Decimal objects (matching nothing); integer widths fold
    together; date/timestamp fold together."""
    import pyarrow as pa
    if pa.types.is_decimal(t):
        return "decimal!" if side == "spark" else "double"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "double"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_date(t) or pa.types.is_timestamp(t):
        return "datetime"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type, side)}>"
    return str(t)

def dtype_check(name, spark_schema, oracle_schema):
    """Driver-calibrated dtype gate: the round-6 driver tree failed 13
    queries the value-level compare below called green — 8 on spark-side
    DECIMAL output columns and 5 on DuckDB SUM(int)->HUGEINT(->float64)
    vs Spark BIGINT. Both classes are pure dtype facts, invisible to
    astype(float) value compares, so they are gated HERE: any spark-side
    DECIMAL fails outright (it surfaces as Decimal objects and matches
    nothing), and any driver-effective class mismatch (int vs double,
    string vs anything, ...) fails. Hash-gated outputs should be
    STRING/BIGINT/deterministic-DOUBLE — SURVEY §8."""
    import pyarrow as pa
    bad = []
    st = {f.name: f.type for f in spark_schema}
    ot = {f.name: f.type for f in oracle_schema}
    for c in sorted(set(st) | set(ot)):
        a, b = st.get(c), ot.get(c)
        if a is None or b is None:
            continue  # column-set mismatch is reported separately
        ca, cb = canon_type(a, "spark"), canon_type(b, "oracle")
        if "decimal!" in ca:
            bad.append({"column": c, "kind": "decimal_output",
                        "side": "spark", "type": str(a)})
        elif ca != cb:
            bad.append({"column": c, "kind": "dtype_mismatch",
                        "spark": f"{ca} ({a})", "oracle": f"{cb} ({b})"})
    return bad

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (e.g. the ScaleData sf1 fixtures):
            # a directory of part files, not the driver's single file
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    report = {}
    for name in sorted(os.listdir(outdir)):
        qdir = os.path.join(outdir, name)
        if not os.path.isdir(qdir):
            continue
        try:
            got, got_schema = load_spark_result(con, qdir)
        except Exception as ex:
            print(f"FAIL {name}: driver-style dir read failed: {ex}")
            n_fail += 1
            report[name] = {"status": "fail", "dir_read_error": str(ex)}
            continue
        if got is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1
            report[name] = {"status": "fail", "reason": "no spark output"}
            continue
        if name not in oracle:
            print(f"SKIP {name}: rows-only check, rows={len(got)}")
            continue
        try:
            exp_arrow = con.execute(oracle[name]).arrow()
            exp = exp_arrow.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1
            report[name] = {"status": "fail", "oracle_sql_error": str(e)}
            continue
        type_bad = dtype_check(name, got_schema, exp_arrow.schema)
        if type_bad:
            for b in type_bad:
                if b["kind"] == "dtype_mismatch":
                    print(f"FAIL {name}: col {b['column']} dtype"
                          f" spark={b['spark']} vs oracle={b['oracle']}")
                else:
                    print(f"FAIL {name}: col {b['column']} is DECIMAL on"
                          f" {b['side']} side ({b['type']}) — not hash-gateable")
            n_fail += 1
            report[name] = {"status": "fail", "dtype_mismatches": type_bad}
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}"); n_fail += 1
            report[name] = {"status": "fail", "spark_columns": list(g.columns),
                            "oracle_columns": list(e.columns)}
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1
            report[name] = {"status": "fail", "spark_rows": len(g),
                            "oracle_rows": len(e)}
            continue
        # exact value compare (mimic hash equality) — report EVERY
        # differing column, not just the first, with count + max delta
        import numpy as np
        bad = []
        for c in g.columns:
            gv, ev = g[c], e[c]
            # date-vs-timestamp canonicalization: the driver hashes
            # date32 and timestamp-at-midnight identically (q16 is
            # driver-green), so compare both as datetimes
            import pandas as pd
            def first_valid(s):
                # classify by the first NON-NULL value: a None/NaN in
                # row 0 of a secondary sort column must not turn off the
                # canonicalization for the whole column
                for v in s:
                    if v is None:
                        continue
                    if isinstance(v, float) and v != v:
                        continue
                    return v
                return None
            def dtish(s):
                return (str(s.dtype).startswith("datetime")
                        or (s.dtype == object
                            and hasattr(first_valid(s), "year")))
            if dtish(gv) or dtish(ev):
                try:
                    gv = pd.to_datetime(gv)
                    ev = pd.to_datetime(ev)
                except Exception:
                    pass
            # oracle-side DECIMAL (small precision) surfaces as Decimal
            # objects on the arrow path but as float64 on the driver's
            # pandas path (q104 is driver-green) — mirror the driver.
            # Spark-side decimals never reach here (dtype gate rejects).
            from decimal import Decimal
            def decish(s):
                return (s.dtype == object
                        and isinstance(first_valid(s), Decimal))
            if decish(gv) or decish(ev):
                gv, ev = gv.astype(float), ev.astype(float)
            try:
                eq = (gv.values == ev.values) | (gv.isna().values & ev.isna().values)
            except Exception:
                eq = gv.astype(str).values == ev.astype(str).values
            if not eq.all():
                i = int(np.argmin(eq))
                detail = {"column": c, "n_diff": int((~eq).sum()),
                          "first_row": i,
                          "spark": repr(gv.iloc[i]), "oracle": repr(ev.iloc[i])}
                try:
                    d = (gv.astype(float) - ev.astype(float)).abs()
                    detail["max_abs_delta"] = float(d.max())
                except Exception:
                    pass
                bad.append(detail)
        if bad:
            for b in bad:
                delta = f" max|Δ|={b['max_abs_delta']:.3g}" if "max_abs_delta" in b else ""
                print(f"FAIL {name}: col {b['column']} differs on {b['n_diff']} rows"
                      f" (first row {b['first_row']}: spark={b['spark']}"
                      f" oracle={b['oracle']}){delta}")
            n_fail += 1
            report[name] = {"status": "fail", "mismatches": bad}
        else:
            print(f"PASS {name} rows={len(g)}"); n_pass += 1
            report[name] = {"status": "pass", "rows": len(g)}
    json.dump(report, open(os.path.join(outdir, "oracle_report.json"), "w"),
              indent=1)
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

def diff_digests(dira, dirb):
    """Name every query/column whose Verify digest differs between two
    output trees — rows, null count (n), min/max, or the
    order-independent hsum fingerprint."""
    n_diff = 0
    names = sorted(set(os.listdir(dira)) | set(os.listdir(dirb)))
    def digest_path(d, name):
        # _digest.json since round 6; fall back to the round-5 name so
        # old trees stay diffable.
        p = os.path.join(d, name, "_digest.json")
        return p if os.path.exists(p) else os.path.join(d, name, "digest.json")
    for name in names:
        pa, pb = (digest_path(d, name) for d in (dira, dirb))
        if not (os.path.isdir(os.path.join(dira, name))
                or os.path.isdir(os.path.join(dirb, name))):
            continue
        if not os.path.exists(pa) or not os.path.exists(pb):
            print(f"DIFF {name}: _digest.json only in "
                  f"{'B' if not os.path.exists(pa) else 'A'}")
            n_diff += 1
            continue
        a, b = json.load(open(pa)), json.load(open(pb))
        if a == b:
            continue
        n_diff += 1
        if a.get("rows") != b.get("rows"):
            print(f"DIFF {name}: rows {a.get('rows')} vs {b.get('rows')}")
        ca, cb = a.get("columns", {}), b.get("columns", {})
        for c in sorted(set(ca) | set(cb)):
            if ca.get(c) == cb.get(c):
                continue
            va, vb = ca.get(c, {}), cb.get(c, {})
            fields = [f for f in ("n", "min", "max", "hsum")
                      if va.get(f) != vb.get(f)]
            print(f"DIFF {name}.{c}: " + "; ".join(
                f"{f}: {va.get(f)} vs {vb.get(f)}" for f in fields))
    print(f"\n{n_diff} quer{'y' if n_diff == 1 else 'ies'} differ")
    return 1 if n_diff else 0

if __name__ == "__main__":
    if sys.argv[1] == "--diff-digests":
        sys.exit(diff_digests(sys.argv[2], sys.argv[3]))
    sys.exit(main(sys.argv[1], sys.argv[2]))
