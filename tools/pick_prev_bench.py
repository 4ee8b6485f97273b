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
  1. candidates = <dir>/r*_sf0.1*.json, minus oracle-gate evidence files
     and minus every file of the excluded (current) round tag;
  2. take the HIGHEST round number;
  3. within it prefer a '*final*' file (the round's designated official
     line), else the lexicographically LAST file whose name does not
     contain 'rerun' (runA < runB < ... matches recording order;
     '*rerun*' lines re-time OLD code for adjudication — e.g.
     r09_sf0.1_r7code_rerun.json — and must never become the baseline).

Usage: pick_prev_bench.py DIR EXCLUDE_TAG   (e.g. bench_history r10)
Prints the chosen path; exits 1 if no candidate exists.
"""
import glob
import os
import re
import sys


def pick(dirpath, exclude_tag):
    cands = []
    for p in glob.glob(os.path.join(dirpath, "r*_sf0.1*.json")):
        name = os.path.basename(p)
        if "oracle_gate" in name:
            continue
        m = re.match(r"r(\d+)_", name)
        if not m or f"r{int(m.group(1)):02d}" == exclude_tag \
                or m.group(0)[:-1] == exclude_tag:
            continue
        cands.append((int(m.group(1)), name, p))
    if not cands:
        return None
    top = max(r for r, _, _ in cands)
    names = sorted((n, p) for r, n, p in cands if r == top)
    finals = [(n, p) for n, p in names if "final" in n]
    if finals:
        return finals[-1][1]
    nonrerun = [(n, p) for n, p in names if "rerun" not in n]
    return (nonrerun or names)[-1][1]


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__.strip().splitlines()[-2], file=sys.stderr)
        sys.exit(2)
    chosen = pick(sys.argv[1], sys.argv[2])
    if chosen is None:
        sys.exit(1)
    print(chosen)
