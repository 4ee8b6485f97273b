#!/usr/bin/env python3
"""Fuzz the oracle gate itself (round-8 task): generate columns of every
hash-gated dtype class from SURVEY §8 through BOTH engines and assert
the gate's classification matches the driver's observed behavior.

The dtype rule in tools/check_oracle.py was LEARNED from driver failures
(rounds 3-6), not proven. This closes the loop:

  1. `sbt "runMain graft.GateFixtures <dir> [seed]"` writes one
     Spark-parquet result per dtype-class case plus oracle_sql.json
     (DuckDB VALUES over the same seeded values) — the exact artifact
     shape Verify ships.
  2. This script runs check_oracle.main() over that tree (the REAL gate,
     not a reimplementation) and asserts each case's verdict equals the
     expectation encoded in its name (pass_* / fail_*), which is the
     driver-calibrated behavior: CORRECTNESS_r06 shows the driver green
     on int32-vs-int64, date-vs-midnight-timestamp and
     oracle-DECIMAL-vs-spark-double, and red on every spark-side DECIMAL
     output and every uncast SUM->HUGEINT oracle.

Classes covered (SURVEY §8 dtype paragraph): BIGINT, int32-vs-int64,
STRING, deterministic DOUBLE, oracle-DECIMAL-vs-double (green, q104),
spark-DECIMAL (red), SUM->HUGEINT uncast (red) + CAST AS BIGINT (green),
date-vs-timestamp-at-midnight (green) + non-midnight values (red),
binary gated as base64 STRING, and two cross-class mismatches (red).

Usage:
  sbt "runMain graft.GateFixtures /tmp/gate_fuzz 42"
  python3 tools/fuzz_oracle_gate.py /tmp/gate_fuzz [sfdir]

Run with a couple of different seeds when touching the gate; any seed
must produce the same per-class verdicts (values change, classes don't).
Dev tool only — not part of the Scala library.
"""
import io
import json
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_oracle  # noqa: E402


def main(outdir, sfdir):
    buf = io.StringIO()
    with redirect_stdout(buf):
        check_oracle.main(outdir, sfdir)
    gate_log = buf.getvalue()
    report = json.load(open(os.path.join(outdir, "oracle_report.json")))
    cases = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    bad = []
    for name in cases:
        expected = "pass" if name.startswith("pass_") else "fail"
        got = report.get(name, {}).get("status", "missing")
        ok = got == expected
        print(f"{'OK ' if ok else 'BAD'} {name}: gate={got} expected={expected}")
        if not ok:
            bad.append(name)
    if bad:
        print("\ngate log for mismatched cases:")
        for line in gate_log.splitlines():
            if any(b in line for b in bad):
                print("  " + line)
        print(f"\n{len(bad)} class(es) where the gate disagrees with the "
              "driver-calibrated expectation")
        return 1
    print(f"\nall {len(cases)} dtype-class cases classified as the driver "
          "would — gate model verified")
    return 0


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gate_fuzz"
    sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    sys.exit(main(outdir, sfdir))
