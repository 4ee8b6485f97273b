#!/usr/bin/env python3
"""Turn a margin-audit report into oracle-gate demotions (round-12
VERDICT task 5: "make the corpus-conditional gates fail safe on margin
erosion").

The q100b/q133 hash gates are corpus-conditional: they are sound while
EITHER the ln-boundary scan or the gap-margin argument holds
(tools/audit_margins.py measures both). Before round 12, a fixture
regeneration that eroded BOTH arguments would still ship the hash gate —
silently unsound. This tool closes that hole: it reads the audit report
and maintains the repo-root `demotions.json` that `graft.Verify`
consults when dumping `oracle_sql.json` — a demoted query's oracle SQL
is OMITTED, so the driver records the honest weaker rows-only check
(and Verify writes the reason next to the dump, so CORRECTNESS readers
see WHY the gate is absent).

Entries are keyed by query name with a `source: margin_audit` tag; the
tool owns exactly those entries — it adds one per `demote: true` query
and REMOVES stale margin-audit entries whose query is sound again
(a re-generated fixture can restore the margins), never touching
entries another process added by hand.

Exit 0 always on a clean run (the demotion IS the handled outcome —
gate scripts must not die here; they read the printed summary and the
file), 3 on crash.

Usage: tools/apply_margin_demotions.py AUDIT_JSON [--file demotions.json]
"""
import argparse
import json
import os
import sys

GATED = ("q100b_dsir_select", "q133_ccnet_buckets")
SOURCE = "margin_audit"


def decide(report):
    """Per gated query: demote iff the report says both arguments failed.

    Returns (demotions, audited): `audited` names the gated queries the
    report actually CONTAINS a verdict for. A gated query ABSENT from
    the report carries no soundness evidence either way — a truncated
    or partial report must KEEP any existing demotion for it, never
    silently restore the hash gate (fail-safe direction; round-12
    advisor finding).

    The audit writes an explicit `demote` field; older reports (or
    hand-crafted ones) may carry only the two argument fields — derive
    the same verdict from those, so the decision NEVER depends on an
    optional field being present.
    """
    out = {}
    audited = set()
    for q in GATED:
        r = report.get(q)
        if r is None:
            print("WARNING: gated query %s absent from audit report — "
                  "keeping any existing demotion (no soundness evidence "
                  "to clear it)" % q, file=sys.stderr)
            continue
        audited.add(q)
        if "demote" in r:
            demote = bool(r["demote"])
        else:
            demote = not (r.get("ln_scan", {}).get("ok", False)
                          or r.get("gap_margin_ok", False))
        if demote:
            ln = r.get("ln_scan", {})
            out[q] = (
                "margin audit at %s: ln scan min %.3g ulps (< %s) AND gap "
                "margin failed (ratio %.3g < factor) — quantized hash gate "
                "unsound, demoted to rows-only" % (
                    report.get("sfdir", "?"),
                    ln.get("min_boundary_ulps", float("nan")),
                    report.get("min_ulps", "?"),
                    r.get("margin_ratio", float("nan"))))
    return out, audited


def apply(audit_path, demotions_path):
    report = json.load(open(audit_path))
    demotions, audited = decide(report)
    existing = {}
    if os.path.exists(demotions_path):
        existing = json.load(open(demotions_path))
    # drop stale margin-audit entries ONLY for queries the report
    # explicitly audited as sound; keep demotions for queries the
    # report is silent on (no evidence = no restore), and keep
    # everything this tool does not own
    kept = {k: v for k, v in existing.items()
            if not (isinstance(v, dict) and v.get("source") == SOURCE
                    and k in audited and k not in demotions)}
    for q, reason in demotions.items():
        kept[q] = {"source": SOURCE, "reason": reason}
    changed = kept != existing
    if changed or not os.path.exists(demotions_path):
        with open(demotions_path, "w") as f:
            json.dump(kept, f, indent=1, sort_keys=True)
            f.write("\n")
    for q in sorted(demotions):
        print("DEMOTE %s: %s" % (q, demotions[q]))
    for q in sorted(set(existing) - set(kept)):
        print("RESTORE %s: margins sound again, hash gate re-enabled" % q)
    if not demotions:
        print("all %d gated queries sound; %s has %d margin demotions"
              % (len(GATED), demotions_path,
                 sum(1 for v in kept.values()
                     if isinstance(v, dict) and v.get("source") == SOURCE)))
    return demotions


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("audit_json")
    p.add_argument("--file", default="demotions.json",
                   help="demotions file graft.Verify reads (repo root)")
    args = p.parse_args()
    apply(args.audit_json, args.file)
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except SystemExit:
        raise
    except Exception:
        import traceback
        traceback.print_exc()
        sys.exit(3)
