#!/usr/bin/env python3
"""Resumable full-catalog DuckDB oracle sweep with per-query isolation.

Usage:
    python3 tools/oracle_sweep.py <sfDir> <verifyOutDir> <resultsJson>
        [--timeout SECONDS] [--mem CAP] [--jobs N]

Round-10 lesson: at native sf1.0 the single-process tools/check.py sweep is
fragile — one oracle OOM kills the process and the 90-minute run restarts
from scratch, which is why sf1 hash coverage stalled at 87/312. This
driver runs each query's compare in its OWN subprocess (tools/check.py
with a name filter) under a wall-clock timeout and a DuckDB memory cap,
records every outcome (ok / fail / timeout / error) in <resultsJson>
incrementally, and skips already-recorded queries on re-run — kill it
anytime, run it again, it continues.
"""
import argparse
import json
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor, as_completed

HERE = os.path.dirname(os.path.abspath(__file__))


def run_one(sf_dir, out_dir, name, timeout, mem):
    env = dict(os.environ, DUCKDB_MEM_CAP=mem)
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(HERE, "check.py"),
             sf_dir, out_dir, name],
            capture_output=True, text=True, timeout=timeout, env=env)
        el = round(time.time() - t0, 1)
        tail = (p.stdout.strip().splitlines() or [""])[0][:400]
        if p.returncode == 0 and tail.startswith("OK"):
            return {"status": "ok", "secs": el, "detail": tail}
        return {"status": "fail", "secs": el,
                "detail": tail or p.stderr.strip()[-400:]}
    except subprocess.TimeoutExpired:
        return {"status": "timeout", "secs": timeout, "detail": ""}
    except Exception as e:  # noqa: BLE001 - record, don't die
        return {"status": "error", "secs": round(time.time() - t0, 1),
                "detail": repr(e)[:400]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("results")
    ap.add_argument("--timeout", type=float, default=900.0)
    ap.add_argument("--mem", default="24GB")
    ap.add_argument("--jobs", type=int, default=2)
    args = ap.parse_args()

    oracle = json.load(open(f"{args.out_dir}/oracle_sql.json"))
    results = {}
    if os.path.exists(args.results):
        results = json.load(open(args.results))
        print(f"resuming: {len(results)} queries already recorded")
    todo = [n for n in sorted(oracle) if n not in results]
    print(f"{len(todo)} to run, timeout {args.timeout}s, mem {args.mem}, "
          f"jobs {args.jobs}")

    def save():
        tmp = args.results + ".tmp"
        with open(tmp, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        os.replace(tmp, args.results)

    with ThreadPoolExecutor(max_workers=args.jobs) as ex:
        futs = {ex.submit(run_one, args.sf_dir, args.out_dir, n,
                          args.timeout, args.mem): n for n in todo}
        done = 0
        for fut in as_completed(futs):
            name = futs[fut]
            results[name] = fut.result()
            done += 1
            save()
            r = results[name]
            print(f"[{done}/{len(todo)}] {r['status']:7s} {name} "
                  f"({r['secs']}s) {r['detail'][:120]}", flush=True)

    counts = {}
    for r in results.values():
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    print(f"== {counts} of {len(oracle)} ==")
    sys.exit(0 if counts.get("ok", 0) == len(oracle) else 1)


if __name__ == "__main__":
    main()
