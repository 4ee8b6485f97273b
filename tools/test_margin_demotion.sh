#!/usr/bin/env bash
# Self-test of the margin-erosion fail-safe (VERDICT r11 task 5): proves
# that a margin audit reporting DOUBLE soundness failure (ln-boundary
# clearance AND gap margin) strips the affected hash gates before the
# oracle dump ships — end to end through the REAL binaries:
#
#   phase 1 (unit, crafted reports): apply_margin_demotions adds
#     double-failure demotions, leaves single-failure queries gated,
#     clears stale demotions when margins are sound again, and never
#     touches entries it does not own.
#   phase 2 (end to end, adversarial audit): the REAL audit_margins.py
#     runs on the REAL sf0.001 fixture with adversarial thresholds
#     (--min-ulps/--factor 1e18 — every corpus fails both arguments,
#     the seeded "regenerated fixture eroded the margins" scenario),
#     must exit 2 with demote=true; the demotion flows through
#     apply_margin_demotions -> demotions file -> graft.Verify, whose
#     oracle_sql.json must OMIT q100b/q133 (check_oracle then SKIPs
#     them as rows-only) while untouched queries keep their gates; a
#     sound report then RESTORES the gates.
#
# The five shipped gates are untouched: everything runs against temp
# demotion files (SPARK_GRAFT_DEMOTIONS), never the repo root's.
#
# Usage: tools/test_margin_demotion.sh   (exit 0 = all assertions hold)
set -euo pipefail
cd "$(dirname "$0")/.."
WORK=$(mktemp -d /tmp/margin_demotion_test.XXXXXX)
trap 'rm -rf "$WORK"' EXIT
fail() { echo "FAIL: $*" >&2; exit 1; }

# ---- phase 1: decision + file maintenance on crafted reports --------
cat > "$WORK/audit_double_fail.json" <<'EOF'
{"sfdir": "/seeded/adversarial", "factor": 10.0, "min_ulps": 100.0,
 "q100b_dsir_select": {"gap_margin_ok": false, "margin_ratio": 0.02,
   "ln_scan": {"ok": false, "min_boundary_ulps": 3.1}, "demote": true},
 "q133_ccnet_buckets": {"gap_margin_ok": true, "margin_ratio": 40.0,
   "ln_scan": {"ok": false, "min_boundary_ulps": 7.7}, "demote": false}}
EOF
# a pre-existing hand-added entry the tool must never touch
cat > "$WORK/demotions.json" <<'EOF'
{"q999_hand_added": {"source": "manual", "reason": "kept forever"}}
EOF
python3 tools/apply_margin_demotions.py "$WORK/audit_double_fail.json" \
  --file "$WORK/demotions.json" > "$WORK/p1.log"
grep -q "DEMOTE q100b_dsir_select" "$WORK/p1.log" \
  || fail "double-failure demotion did not fire"
python3 - "$WORK/demotions.json" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
assert "q100b_dsir_select" in d, "q100b missing from demotions"
assert d["q100b_dsir_select"]["source"] == "margin_audit"
# q133 failed only ONE argument (ln scan) — its gap margin holds, so it
# stays hash-gated
assert "q133_ccnet_buckets" not in d, "single-failure query was demoted"
assert d["q999_hand_added"]["reason"] == "kept forever"
EOF
# sound re-audit clears the demotion (fixture regenerated back healthy)
cat > "$WORK/audit_sound.json" <<'EOF'
{"sfdir": "/seeded/healthy", "factor": 10.0, "min_ulps": 100.0,
 "q100b_dsir_select": {"gap_margin_ok": true, "margin_ratio": 50.0,
   "ln_scan": {"ok": true, "min_boundary_ulps": 2e6}, "demote": false},
 "q133_ccnet_buckets": {"gap_margin_ok": true, "margin_ratio": 40.0,
   "ln_scan": {"ok": true, "min_boundary_ulps": 2e6}, "demote": false}}
EOF
python3 tools/apply_margin_demotions.py "$WORK/audit_sound.json" \
  --file "$WORK/demotions.json" > "$WORK/p1b.log"
python3 - "$WORK/demotions.json" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
assert "q100b_dsir_select" not in d, "sound re-audit did not clear demotion"
assert d["q999_hand_added"]["reason"] == "kept forever"
EOF
# a TRUNCATED report (gated query entirely absent) must KEEP an
# existing demotion — absence is not soundness evidence, and clearing
# on it would silently restore an unsound hash gate (r12 advisor)
python3 tools/apply_margin_demotions.py "$WORK/audit_double_fail.json" \
  --file "$WORK/demotions.json" > /dev/null   # re-demote q100b
cat > "$WORK/audit_truncated.json" <<'EOF'
{"sfdir": "/seeded/truncated", "factor": 10.0, "min_ulps": 100.0,
 "q133_ccnet_buckets": {"gap_margin_ok": true, "margin_ratio": 40.0,
   "ln_scan": {"ok": true, "min_boundary_ulps": 2e6}, "demote": false}}
EOF
python3 tools/apply_margin_demotions.py "$WORK/audit_truncated.json" \
  --file "$WORK/demotions.json" > "$WORK/p1c.log" 2> "$WORK/p1c.err"
grep -q "absent from audit report" "$WORK/p1c.err" \
  || fail "truncated report did not warn about the unaudited gate"
python3 - "$WORK/demotions.json" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
assert "q100b_dsir_select" in d, \
    "truncated report silently RESTORED a demoted hash gate"
assert d["q999_hand_added"]["reason"] == "kept forever"
EOF
# ... and the sound FULL report still restores it
python3 tools/apply_margin_demotions.py "$WORK/audit_sound.json" \
  --file "$WORK/demotions.json" > /dev/null
python3 - "$WORK/demotions.json" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
assert "q100b_dsir_select" not in d
EOF
echo "phase 1 OK: decision, single-vs-double failure, restore, truncation fail-safe, ownership"

# ---- phase 2: end to end through the real audit + Verify ------------
SF=/root/testdata/sf0.001
RC=0
python3 tools/audit_margins.py "$SF" --min-ulps 1e18 --factor 1e18 \
  --json "$WORK/audit_adversarial.json" > /dev/null || RC=$?
[ "$RC" -eq 2 ] || fail "adversarial audit expected exit 2, got $RC"
python3 - "$WORK/audit_adversarial.json" <<'EOF'
import json, sys
r = json.load(open(sys.argv[1]))
for q in ("q100b_dsir_select", "q133_ccnet_buckets"):
    assert r[q]["demote"] is True, f"{q} not marked demote"
EOF
python3 tools/apply_margin_demotions.py "$WORK/audit_adversarial.json" \
  --file "$WORK/demotions_e2e.json" > /dev/null
QF="q100b_dsir_select,q133_ccnet_buckets,q135_contamination_bloom"
rm -rf "$WORK/out"
SPARK_GRAFT_VERIFY_FILTER="$QF" \
  SPARK_GRAFT_DEMOTIONS="$WORK/demotions_e2e.json" \
  sbt -batch "runMain graft.Verify $SF $WORK/out" > "$WORK/verify.log" 2>&1 \
  || { tail -20 "$WORK/verify.log"; fail "Verify run failed"; }
python3 - "$WORK/out" <<'EOF'
import json, sys, os
out = sys.argv[1]
sql = json.load(open(os.path.join(out, "oracle_sql.json")))
dem = json.load(open(os.path.join(out, "demotions.json")))
for q in ("q100b_dsir_select", "q133_ccnet_buckets"):
    assert q not in sql, f"{q} still ships oracle SQL while demoted"
    assert q in dem, f"{q} demotion reason not recorded next to the dump"
# an un-demoted gate is untouched
assert "q135_contamination_bloom" in sql, "untouched gate lost its oracle"
# the result parquet still exists: demotion weakens the CHECK, the
# query itself still runs and dumps (rows-only)
assert os.path.isdir(os.path.join(out, "q100b_dsir_select"))
EOF
# the gate tool reads the demoted dump as SKIP (rows-only), not FAIL
python3 tools/check_oracle.py "$WORK/out" "$SF" > "$WORK/oracle.log" \
  || fail "check_oracle failed on the demoted dump"
grep -q "^SKIP q100b_dsir_select" "$WORK/oracle.log" \
  || fail "demoted query did not SKIP in check_oracle"
grep -q "^PASS q135_contamination_bloom" "$WORK/oracle.log" \
  || fail "untouched gate did not PASS"
# restore: a sound report re-enables the gates in the next dump
python3 tools/apply_margin_demotions.py "$WORK/audit_sound.json" \
  --file "$WORK/demotions_e2e.json" > /dev/null
rm -rf "$WORK/out2"
SPARK_GRAFT_VERIFY_FILTER="q100b_dsir_select" \
  SPARK_GRAFT_DEMOTIONS="$WORK/demotions_e2e.json" \
  sbt -batch "runMain graft.Verify $SF $WORK/out2" > "$WORK/verify2.log" 2>&1 \
  || { tail -20 "$WORK/verify2.log"; fail "restore Verify run failed"; }
python3 - "$WORK/out2" <<'EOF'
import json, sys, os
sql = json.load(open(os.path.join(sys.argv[1], "oracle_sql.json")))
assert "q100b_dsir_select" in sql, "sound margins did not restore the gate"
EOF
echo "phase 2 OK: adversarial audit -> demotion -> rows-only dump -> restore"
echo "margin-demotion fail-safe: ALL OK"
