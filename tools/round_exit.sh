#!/usr/bin/env bash
# Round-exit evidence, in one command (VERDICT r9 task 6): every
# end-of-round check the judge expects, run the same way every round and
# recorded as a single committed JSON — so the evidence does not depend
# on builder discipline.
#
# Usage: tools/round_exit.sh TAG NEW_BENCH [PREV_BENCH] [SF1_BENCH]
#   TAG        e.g. r10 — names the output bench_history/<TAG>_exit.json
#   NEW_BENCH  this round's full sf0.1 bench line (bench_result.json copy)
#   PREV_BENCH previous round's full sf0.1 line (default: auto = newest
#              bench_history/r*_sf0.1*.json older than NEW_BENCH's tag)
#   SF1_BENCH  optional full sf1 line for the 10x growth table
#
# Checks (each recorded with its exit code; the script exits 1 if any
# REQUIRED check fails):
#   corpus_gate   tools/gate_sf01.sh — re-proves the corpus-conditional
#                 hash gates (q135/q121c/q109c) at sf0.1      [required]
#   bench_compare check_bench.py compare --epoch-normalize vs PREV_BENCH
#                 with the calibrated sf0.1 noise profile      [required]
#   bench_anomaly check_bench.py anomaly on NEW_BENCH — exit 2 (min
#                 poisoned) fails the round; exit 1 (a flagged load
#                 window, min still valid) is recorded loudly  [required]
#   sf1_growth    check_bench.py growth sf0.1 -> sf1           [optional]
#   leakcheck     grep for internal/proprietary strings over src/ +
#                 build.sbt + tools/, LEAKCHECK.json categories [required]
#   padding       grep for ??? stubs / TODO / FIXME in src/main [required]
set -uo pipefail
cd "$(dirname "$0")/.."

TAG="${1:?usage: tools/round_exit.sh TAG NEW_BENCH [PREV_BENCH] [SF1_BENCH]}"
NEW_BENCH="${2:?NEW_BENCH (full bench line) required}"
PREV_BENCH="${3:-}"
SF1_BENCH="${4:-}"
WORK=$(mktemp -d /tmp/round_exit.XXXXXX)

if [ -z "$PREV_BENCH" ]; then
  # newest PRIOR ROUND's line, picked by round tag — never by mtime
  # (after a fresh checkout `ls -t` order is arbitrary: the first r10
  # exit evidence compared against r07 that way), never a same-round
  # sibling (runB, calA/calB — the compare would be the round against
  # itself, vacuously green), and never NEW_BENCH itself (passed as an
  # explicit exclusion so even a mislabeled TAG can't self-compare).
  # Rules + self-test: tools/pick_prev_bench.py
  PREV_BENCH=$(python3 tools/pick_prev_bench.py bench_history "$TAG" \
    "$NEW_BENCH" || true)
fi

run() { # name required(0/1) cmd...
  local name="$1" req="$2"; shift 2
  echo "== $name: $*" >&2
  "$@" >"$WORK/$name.out" 2>&1
  local rc=$?
  echo "$rc" >"$WORK/$name.rc"
  echo "$req" >"$WORK/$name.req"
  tail -5 "$WORK/$name.out" >&2
  return 0
}

# tool self-test first: the bench_anomaly verdict below means nothing
# if the anomaly exit contract itself is broken
run anomaly_selftest 1 tools/test_check_bench.sh

run corpus_gate 1 tools/gate_sf01.sh "$TAG"

if [ -n "$PREV_BENCH" ] && [ -f "$PREV_BENCH" ]; then
  run bench_compare 1 python3 tools/check_bench.py compare \
    "$PREV_BENCH" "$NEW_BENCH" --noise bench_history/noise_sf0.1.json \
    --epoch-normalize
else
  echo "no previous sf0.1 bench line found" >"$WORK/bench_compare.out"
  echo 1 >"$WORK/bench_compare.rc"; echo 1 >"$WORK/bench_compare.req"
fi

run bench_anomaly 1 python3 tools/check_bench.py anomaly "$NEW_BENCH"

if [ -n "$SF1_BENCH" ] && [ -f "$SF1_BENCH" ]; then
  run sf1_growth 0 python3 tools/check_bench.py growth \
    "$NEW_BENCH" "$SF1_BENCH" --data-factor 10
fi

# LEAKCHECK-shaped grep: the per-round driver check's categories,
# re-runnable locally. Anything matching is a finding to adjudicate.
run leakcheck 1 bash -c '
  hits=0
  scan() { # category pattern
    local n
    n=$(grep -rEn --exclude=round_exit.sh "$2" src build.sbt tools \
        2>/dev/null | grep -v "Binary file" | head -20)
    if [ -n "$n" ]; then echo "[$1]"; echo "$n"; hits=1; fi
  }
  scan internal-import "import +(com|ai|org)\.anthropic|anthropic"
  scan internal-url "https?://[a-z0-9.-]*\.(anthropic|corp|internal)[./]"
  # generic scheme mentions (hdfs://..., s3a:// in scaladoc) are fine;
  # a CONCRETE bucket/host name is the leak
  scan internal-bucket "(s3|s3a|gs)://[a-z0-9]|hdfs://[a-z0-9]"
  scan slack-link "slack\.com|app\.slack|#[a-z-]*claude"
  scan api-key "AKIA[0-9A-Z]{16}|xox[baprs]-|sk-[A-Za-z0-9]{20}"
  scan axon-env "AXON_|ANTHROPIC_"
  exit $hits'

# padding grep: the judge's per-round scan — a completed engine ships
# zero ??? stubs and zero TODO/FIXME in production sources
run padding 1 bash -c \
  '! grep -rn "???\|TODO\|FIXME" src/main/scala --include="*.scala"'

python3 - "$TAG" "$WORK" "$NEW_BENCH" "$PREV_BENCH" "$SF1_BENCH" <<'EOF'
import json, os, subprocess, sys
tag, work, new_bench, prev_bench, sf1_bench = sys.argv[1:6]
commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                        capture_output=True, text=True).stdout.strip()
checks, failed = {}, []
for name in sorted(os.listdir(work)):
    if not name.endswith(".rc"):
        continue
    base = name[:-3]
    rc = int(open(f"{work}/{name}").read().strip())
    req = int(open(f"{work}/{base}.req").read().strip())
    out = open(f"{work}/{base}.out").read().strip().splitlines()
    checks[base] = {"exit": rc, "required": bool(req), "tail": out[-12:]}
    # anomaly exit 1 = load window flagged but min valid: recorded, not
    # a failure; exit 2 = min poisoned and exit 3 = could-not-analyze
    # (no passes matrix / bad line — the check never ran): both fail
    ok = rc == 0 or (base == "bench_anomaly" and rc == 1)
    if req and not ok:
        failed.append(base)
out = {"round_exit": tag, "commit": commit, "new_bench": new_bench,
       "prev_bench": prev_bench or None, "sf1_bench": sf1_bench or None,
       "failed_required": failed, "checks": checks}
path = f"bench_history/{tag}_exit.json"
json.dump(out, open(path, "w"), indent=1)
print(f"wrote {path}; failed_required={failed}")
sys.exit(1 if failed else 0)
EOF
rc=$?
rm -rf "$WORK"
exit $rc
