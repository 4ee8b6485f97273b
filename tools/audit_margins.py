#!/usr/bin/env python3
"""Margin audit for the round-11 quantized-decimal order gates.

q100b (DSIR selection) and q133 (CCNet buckets) hash-gate an ORDER
derived from 1e-6-quantized ln sums (the q109c/q121c discipline). The
gate is sound only while adjacent order keys are separated by more than
the worst-case cross-engine wobble — one ln landing within a ulp of a
5e-7 rounding boundary flips that feature's quantized value by 1e-6,
shifting a doc's key by (feature count) x 1e-6 (q100b, absolute sum) or
by <= 1e-6 (q133, the per-bigram mean). This tool measures, per sf dir:

  q100b: the minimum adjacent gap between DISTINCT logw_sum values in
      the top 60 (covers every in-cut comparison plus the rank-50
      boundary), and the largest single-feature count in those docs
      (the 1e-6 multiplier).
  q133: per language, the minimum |logprob| gap between the docs
      adjacent to each tercile boundary (the only comparisons that can
      flip a bucket), and the global minimum adjacent distinct gap.

The PRIMARY soundness check is more direct than the gap margins: the
quantized sums are BIT-IDENTICAL cross-engine (and any positive gap
suffices, with exact ties broken by doc_id on both engines) as long as
no ln value used by the model sits close to a 5e-7 rounding boundary.
Cross-engine libm ln implementations agree to within ~1-2 ulps, so the
audit scans every DISTINCT ln the model joins produce and reports the
minimum distance to a rounding boundary in ulps of the scaled value.

With every ln clear of its boundary the sums agree bit-for-bit, exact
ties (identical decimals on both engines) break by doc_id identically,
and the gate is sound regardless of how small the gaps are. A query is
therefore SOUND when EITHER argument holds: the ln scan clears
--min-ulps (default 100; ~50x the worst realistic libm divergence), or
the gap margins clear --factor x the wobble bound (each argument alone
suffices; they fail independently). Exit codes (round 12, the
auto-demotion contract): 0 when every query is sound, 2 when at least
one query fails BOTH arguments — its "demote" field is true and
tools/apply_margin_demotions.py must strip its hash gate before the
round ships — and 3 on crash. Re-run after any fixture regeneration —
the gates are corpus-conditional.

Usage: tools/audit_margins.py SFDIR [--factor 10] [--min-ulps 100]
       [--json OUT]
"""
import math
import argparse
import json
import sys

import duckdb

Q100B_KEYS = """
WITH ft AS (SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS toks
            FROM read_parquet('{d}/documents.parquet')),
u AS (SELECT doc_id, lang, 'u:' || w AS feat
      FROM (SELECT doc_id, lang, unnest(toks) AS w FROM ft)),
b AS (SELECT doc_id, lang, 'b:' || toks[i] || ' ' || toks[i + 1] AS feat
      FROM ft, UNNEST(range(1, len(toks))) AS t(i)),
f AS (SELECT doc_id, lang,
             ('0x' || substr(md5(feat), 1, 15))::BIGINT % 10000 AS k
      FROM (SELECT * FROM u UNION ALL SELECT * FROM b)),
doc AS (SELECT doc_id, k, CAST(count(*) AS BIGINT) AS c
        FROM f GROUP BY doc_id, k),
tm AS (SELECT k, CAST(count(*) AS BIGINT) AS t FROM f
       WHERE lang = 'en' GROUP BY k),
rm AS (SELECT k, CAST(count(*) AS BIGINT) AS r FROM f GROUP BY k),
tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM f WHERE lang = 'en') AS nt,
               (SELECT CAST(count(*) AS BIGINT) FROM f) AS nr),
j AS (SELECT doc.doc_id, doc.c,
        (CAST(ln((COALESCE(tm.t, 0) + 1.0) / (tot.nt + 1.0 * 10000)) AS DECIMAL(25,6))
         - CAST(ln((COALESCE(rm.r, 0) + 1.0) / (tot.nr + 1.0 * 10000)) AS DECIMAL(25,6)))
          * CAST(doc.c AS DECIMAL(10,0)) AS wl
      FROM doc LEFT JOIN tm ON tm.k = doc.k
               LEFT JOIN rm ON rm.k = doc.k
               CROSS JOIN tot)
SELECT doc_id, CAST(sum(wl) AS DOUBLE) AS sc,
       CAST(max(c) AS BIGINT) AS max_feat_count
FROM j GROUP BY doc_id ORDER BY sum(wl) DESC, doc_id LIMIT 60
"""

Q133_KEYS = """
WITH tr AS (SELECT string_split_regex(trim(text), ' +') AS toks
            FROM read_parquet('{d}/documents.parquet') WHERE doc_id % 5 <> 0),
u AS (SELECT w1, CAST(count(*) AS BIGINT) AS u
      FROM (SELECT unnest(toks) AS w1 FROM tr) GROUP BY w1),
b AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS b
      FROM (SELECT toks[i] AS w1, toks[i + 1] AS w2
            FROM tr, UNNEST(range(1, len(toks))) AS t(i))
      GROUP BY w1, w2),
v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM u),
co AS (SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS toks
       FROM read_parquet('{d}/documents.parquet') WHERE doc_id % 5 = 0),
dbc AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
              FROM co, UNNEST(range(1, len(toks))) AS t(i))
        GROUP BY doc_id, w1, w2),
j AS (SELECT dbc.doc_id, dbc.c,
        CAST(ln((COALESCE(b.b, 0) + 1.0) / (COALESCE(u.u, 0) + 1.0 * v.v))
          AS DECIMAL(25,6)) * CAST(dbc.c AS DECIMAL(10,0)) AS wlp
      FROM dbc LEFT JOIN b ON b.w1 = dbc.w1 AND b.w2 = dbc.w2
               LEFT JOIN u ON u.w1 = dbc.w1, v),
lm AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
              CAST(CAST(sum(wlp) AS DECIMAL(38,6)) AS DOUBLE)
                / CAST(sum(c) AS BIGINT) AS logprob
       FROM j GROUP BY doc_id)
SELECT lm.doc_id, d.lang, lm.logprob
FROM lm JOIN (SELECT doc_id, lang FROM read_parquet('{d}/documents.parquet')
              WHERE doc_id % 5 = 0) d USING (doc_id)
ORDER BY d.lang, lm.logprob DESC, lm.doc_id
"""


Q100B_LNS = """
WITH ft AS (SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS toks
            FROM read_parquet('{d}/documents.parquet')),
u AS (SELECT doc_id, lang, 'u:' || w AS feat
      FROM (SELECT doc_id, lang, unnest(toks) AS w FROM ft)),
b AS (SELECT doc_id, lang, 'b:' || toks[i] || ' ' || toks[i + 1] AS feat
      FROM ft, UNNEST(range(1, len(toks))) AS t(i)),
f AS (SELECT doc_id, lang,
             ('0x' || substr(md5(feat), 1, 15))::BIGINT % 10000 AS k
      FROM (SELECT * FROM u UNION ALL SELECT * FROM b)),
doc AS (SELECT DISTINCT k FROM f),
tm AS (SELECT k, CAST(count(*) AS BIGINT) AS t FROM f
       WHERE lang = 'en' GROUP BY k),
rm AS (SELECT k, CAST(count(*) AS BIGINT) AS r FROM f GROUP BY k),
tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM f WHERE lang = 'en') AS nt,
               (SELECT CAST(count(*) AS BIGINT) FROM f) AS nr)
SELECT DISTINCT CAST(ln((COALESCE(tm.t, 0) + 1.0) / (tot.nt + 1.0 * 10000)) AS DOUBLE) AS lnv
FROM doc LEFT JOIN tm ON tm.k = doc.k CROSS JOIN tot
UNION
SELECT DISTINCT CAST(ln((COALESCE(rm.r, 0) + 1.0) / (tot.nr + 1.0 * 10000)) AS DOUBLE) AS lnv
FROM doc LEFT JOIN rm ON rm.k = doc.k CROSS JOIN tot
"""

Q133_LNS = """
WITH tr AS (SELECT string_split_regex(trim(text), ' +') AS toks
            FROM read_parquet('{d}/documents.parquet') WHERE doc_id % 5 <> 0),
u AS (SELECT w1, CAST(count(*) AS BIGINT) AS u
      FROM (SELECT unnest(toks) AS w1 FROM tr) GROUP BY w1),
b AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS b
      FROM (SELECT toks[i] AS w1, toks[i + 1] AS w2
            FROM tr, UNNEST(range(1, len(toks))) AS t(i))
      GROUP BY w1, w2),
v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM u),
co AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
       FROM read_parquet('{d}/documents.parquet') WHERE doc_id % 5 = 0),
dbc AS (SELECT DISTINCT w1, w2
        FROM (SELECT toks[i] AS w1, toks[i + 1] AS w2
              FROM co, UNNEST(range(1, len(toks))) AS t(i)))
SELECT DISTINCT CAST(ln((COALESCE(b.b, 0) + 1.0) / (COALESCE(u.u, 0) + 1.0 * v.v))
                     AS DOUBLE) AS lnv
FROM dbc LEFT JOIN b ON b.w1 = dbc.w1 AND b.w2 = dbc.w2
         LEFT JOIN u ON u.w1 = dbc.w1, v
"""


def ln_boundary_scan(con, sql, min_ulps):
    """Min distance, in ulps of the 1e6-scaled value, from any distinct
    model ln to a DECIMAL(25,6) rounding boundary (odd multiples of
    5e-7 -> half-integers of the scaled value)."""
    vals = [r[0] for r in con.execute(sql).fetchall() if r[0] is not None]
    worst, worst_v = float("inf"), None
    for lnv in vals:
        q = lnv * 1e6
        frac = q - math.floor(q)
        dist = abs(frac - 0.5)
        ulps = dist / math.ulp(q) if q else float("inf")
        if ulps < worst:
            worst, worst_v = ulps, lnv
    return {"n_distinct_lns": len(vals), "min_boundary_ulps": worst,
            "worst_ln": worst_v, "ok": worst >= min_ulps}


def audit_q100b(con, d, factor):
    rows = con.execute(Q100B_KEYS.format(d=d)).fetchall()
    scs = [r[1] for r in rows]
    max_c = max(r[2] for r in rows)
    gaps = [a - b for a, b in zip(scs, scs[1:]) if a != b]
    min_gap = min(gaps) if gaps else float("inf")
    ties = len(scs) - 1 - len(gaps)
    bound = max_c * 1e-6  # one flipped ln on the heaviest feature
    return {
        "n": len(rows), "min_adjacent_gap": min_gap,
        "exact_ties": ties, "max_feature_count": max_c,
        "wobble_bound": bound, "margin_ratio":
            (min_gap / bound) if bound else float("inf"),
        "ok": min_gap >= factor * bound,
    }


def audit_q133(con, d, factor):
    rows = con.execute(Q133_KEYS.format(d=d)).fetchall()
    by_lang = {}
    for doc_id, lang, lp in rows:
        by_lang.setdefault(lang, []).append(lp)
    bound = 1e-6  # one flipped ln moves the mean by <= c*1e-6/n <= 1e-6
    boundary_gaps, global_min = [], float("inf")
    for lang, lps in by_lang.items():
        n = len(lps)
        gaps = [a - b for a, b in zip(lps, lps[1:]) if a != b]
        if gaps:
            global_min = min(global_min, min(gaps))
        # cume_dist boundaries: ranks floor(n/3) | +1 and floor(2n/3) | +1
        for cut in (n // 3, (2 * n) // 3):
            if 1 <= cut < n and lps[cut - 1] != lps[cut]:
                boundary_gaps.append(lps[cut - 1] - lps[cut])
    min_boundary = min(boundary_gaps) if boundary_gaps else float("inf")
    return {
        "n": len(rows), "langs": len(by_lang),
        "min_boundary_gap": min_boundary,
        "min_adjacent_gap": global_min,
        "wobble_bound": bound, "margin_ratio": min_boundary / bound,
        "ok": min_boundary >= factor * bound,
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sfdir")
    p.add_argument("--factor", type=float, default=10.0,
                   help="reported margin / wobble-bound ratio (context)")
    p.add_argument("--min-ulps", type=float, default=100.0,
                   help="required ln distance to a rounding boundary")
    p.add_argument("--json", help="write the report to this path too")
    args = p.parse_args()
    con = duckdb.connect()
    q100b = audit_q100b(con, args.sfdir, args.factor)
    q100b["gap_margin_ok"] = q100b.pop("ok")
    q100b["ln_scan"] = ln_boundary_scan(
        con, Q100B_LNS.format(d=args.sfdir), args.min_ulps)
    q133 = audit_q133(con, args.sfdir, args.factor)
    q133["gap_margin_ok"] = q133.pop("ok")
    q133["ln_scan"] = ln_boundary_scan(
        con, Q133_LNS.format(d=args.sfdir), args.min_ulps)
    report = {
        "sfdir": args.sfdir, "factor": args.factor,
        "min_ulps": args.min_ulps,
        "q100b_dsir_select": q100b,
        "q133_ccnet_buckets": q133,
    }
    # either argument alone makes the gate sound; failing BOTH demotes
    for k in ("q100b_dsir_select", "q133_ccnet_buckets"):
        report[k]["sound"] = bool(report[k]["ln_scan"]["ok"]
                                  or report[k]["gap_margin_ok"])
        report[k]["demote"] = not report[k]["sound"]
    out = json.dumps(report, indent=1, default=str)
    print(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out + "\n")
    all_sound = all(report[k]["sound"] for k in
                    ("q100b_dsir_select", "q133_ccnet_buckets"))
    return 0 if all_sound else 2


if __name__ == "__main__":
    try:
        sys.exit(main())
    except SystemExit:
        raise
    except Exception:
        import traceback
        traceback.print_exc()
        sys.exit(3)
