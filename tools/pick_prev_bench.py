#!/usr/bin/env python3
"""Pick the previous round's sf0.1 bench baseline from bench_history/.

round_exit.sh's required regression compare needs "the newest recorded
line that is NOT this round's". `ls -t` (filesystem mtime) is the wrong
order: after a fresh clone/checkout every file carries checkout-time
mtimes in directory-listing order, not history order — the first r10
exit evidence compared r10 against r07 that way and recorded a false
required-check failure (a phantom q56 regression against a two-round-old
baseline with no machine probe).

Rule (mtime never consulted):
  1. candidates = <dir>/r*_sf0.1*.json, minus oracle-gate evidence
     files, minus every file of the excluded (current) round — matched
     by ROUND NUMBER, so tags 'r9' and 'r09' exclude the same round —
     and minus the literal NEW_BENCH path when given (the compare must
     never be a file against itself, even under a mislabeled tag);
  2. walk rounds from the highest remaining DOWN; within a round prefer
     a '*final*' file (the round's designated official line), else the
     lexicographically LAST file whose name does not contain 'rerun'
     (runA < runB < ... matches recording order);
  3. '*rerun*' lines re-time OLD code for adjudication (e.g.
     r09_sf0.1_r7code_rerun.json) and must NEVER become the baseline:
     a round holding only reruns is skipped entirely in favor of the
     next older round.

Usage: pick_prev_bench.py DIR EXCLUDE_TAG [EXCLUDE_FILE]
       (e.g. bench_history r10 bench_history/r10_sf0.1_runE.json)
Prints the chosen path; exits 1 if no candidate exists.
"""
import glob
import os
import re
import sys


def pick(dirpath, exclude_tag, exclude_file=None):
    m = re.fullmatch(r"r?0*(\d+)", exclude_tag)
    excl_round = int(m.group(1)) if m else None
    excl_path = os.path.abspath(exclude_file) if exclude_file else None
    by_round = {}
    for p in glob.glob(os.path.join(dirpath, "r*_sf0.1*.json")):
        name = os.path.basename(p)
        if "oracle_gate" in name:
            continue
        mm = re.match(r"r(\d+)_", name)
        if not mm or int(mm.group(1)) == excl_round:
            continue
        if excl_path and os.path.abspath(p) == excl_path:
            continue
        by_round.setdefault(int(mm.group(1)), []).append((name, p))
    for rnd in sorted(by_round, reverse=True):
        names = sorted(by_round[rnd])
        finals = [p for n, p in names if "final" in n]
        if finals:
            return finals[-1]
        nonrerun = [p for n, p in names if "rerun" not in n]
        if nonrerun:
            return nonrerun[-1]
        # this round holds only rerun adjudication lines — keep walking
    return None


if __name__ == "__main__":
    if len(sys.argv) not in (3, 4):
        print("usage: pick_prev_bench.py DIR EXCLUDE_TAG [EXCLUDE_FILE]",
              file=sys.stderr)
        sys.exit(2)
    chosen = pick(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) == 4 else None)
    if chosen is None:
        sys.exit(1)
    print(chosen)
