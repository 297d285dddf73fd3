#!/usr/bin/env python3
"""One-command round-close ritual (round-11 verdict #7).

Chains every correctness/consistency gate this repo has grown, in the
order that catches the known failure modes, and exits nonzero if ANY gate
fails:

  1. FULL graft.Verify at sf0.01 -> a fresh out dir. Always unfiltered:
     a name-filtered Verify OVERWRITES digests.json / oracle_sql.json
     with only the filtered entries (the round-10 gotcha), so this script
     never passes query names through.
  2. tools/oracle_sweep.py  - per-query DuckDB compare, parallel+resumable
  3. tools/dtype_audit.py   - pandas-dtype parity (latent driver-hash reds)
  4. tools/oracle_determinism.py - oracle SQL stable across DuckDB runs
  5. tools/digestdiff.py vs the newest committed digests_r*.json -
     differences fail the gate unless listed in --expect-diff (deliberate
     contract changes must be named, not discovered)
  6. tools/scale_ratio.py on --bench-small/--bench-big when both given -
     the superlinear-growth gate

Usage:
  python3 tools/round_close.py [--sf /root/testdata/sf0.01]
      [--out /tmp/round_close] [--expect-diff q1,q2]
      [--bench-small BENCH_sf1.json --bench-big BENCH_sf10.json
       --sf-factor 10] [--skip-verify]

--skip-verify reuses an existing --out dir (e.g. the Verify you just ran)
but still refuses to proceed if its oracle_sql.json looks filtered
(fewer entries than SparkEntry registers at last count).
"""
import argparse
import glob
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def step(name, argv, **kw):
    print(f"\n=== {name}: {' '.join(argv)}", flush=True)
    r = subprocess.run(argv, cwd=REPO, **kw)
    ok = r.returncode == 0
    print(f"=== {name}: {'OK' if ok else 'FAIL (exit %d)' % r.returncode}",
          flush=True)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/round_close")
    ap.add_argument("--expect-diff", default="",
                    help="comma-separated queries whose digest may differ "
                         "from the last committed round (deliberate "
                         "contract changes)")
    ap.add_argument("--bench-small")
    ap.add_argument("--bench-big")
    ap.add_argument("--sf-factor", default="10")
    ap.add_argument("--skip-verify", action="store_true")
    ap.add_argument("--jobs", default="4")
    args = ap.parse_args()

    failures = []

    if not args.skip_verify:
        if not step("verify (FULL)", [
                "sbt", "-batch", f"runMain graft.Verify {args.sf} {args.out}"]):
            print("Verify failed; aborting (everything downstream reads "
                  "its output)")
            sys.exit(1)

    # guard the filtered-Verify gotcha even on --skip-verify reuse
    oracle_path = f"{args.out}/oracle_sql.json"
    if not os.path.exists(oracle_path):
        sys.exit(f"{oracle_path} missing — run without --skip-verify")
    n_oracle = len(json.load(open(oracle_path)))
    prev_digests = sorted(glob.glob(f"{REPO}/digests_r*.json"),
                          key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))
    if prev_digests:
        n_prev = len(json.load(open(prev_digests[-1])))
        if n_oracle < n_prev:
            sys.exit(f"{oracle_path} has {n_oracle} entries < last round's "
                     f"{n_prev}: looks like a name-filtered Verify overwrote "
                     "it — re-run without --skip-verify")

    sweep_json = f"{args.out}/sweep_results.json"
    if not step("oracle_sweep", [
            sys.executable, f"{HERE}/oracle_sweep.py", args.sf, args.out,
            sweep_json, "--jobs", args.jobs]):
        failures.append("oracle_sweep")

    if not step("dtype_audit", [
            sys.executable, f"{HERE}/dtype_audit.py", args.sf, args.out]):
        failures.append("dtype_audit")

    if not step("oracle_determinism", [
            sys.executable, f"{HERE}/oracle_determinism.py", args.sf,
            args.out]):
        failures.append("oracle_determinism")

    if prev_digests:
        expected = set(x for x in args.expect_diff.split(",") if x)
        r = subprocess.run(
            [sys.executable, f"{HERE}/digestdiff.py", prev_digests[-1],
             f"{args.out}/digests.json"],
            cwd=REPO, capture_output=True, text=True)
        print(f"\n=== digestdiff vs {os.path.basename(prev_digests[-1])}")
        print(r.stdout.strip())
        diffed = set(re.findall(r"^(?:DIFF|ONLY-[AB]) ([^.:\s]+)",
                                r.stdout, re.M))
        unexpected = diffed - expected
        missing = expected - diffed
        if missing:
            print(f"note: --expect-diff names did not differ: "
                  f"{sorted(missing)}")
        if unexpected:
            print(f"=== digestdiff: FAIL — UNEXPECTED diffs {sorted(unexpected)}"
                  f" (allowed: {sorted(expected) or 'none'})")
            failures.append("digestdiff")
        else:
            print("=== digestdiff: OK (all diffs expected)")
    else:
        print("no committed digests_r*.json — skipping digestdiff")

    if args.bench_small and args.bench_big:
        if not step("scale_ratio", [
                sys.executable, f"{HERE}/scale_ratio.py", args.bench_small,
                args.bench_big, "--sf-factor", args.sf_factor]):
            failures.append("scale_ratio")
    else:
        print("\n(no --bench-small/--bench-big pair — scale_ratio skipped)")

    print(f"\n##### round_close: "
          f"{'ALL GATES GREEN' if not failures else 'FAILED: ' + ', '.join(failures)}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
