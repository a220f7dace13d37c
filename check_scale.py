#!/usr/bin/env python3
"""Parallel driver for check.py at SCALE corpora (dev tool only).

check.py replays the driver's DuckDB-oracle compare sequentially in one
process; at sf1 (6 M lineitem / 50 k documents) a handful of oracle
CTEs — the documented deliberate quadratics (exact knn over 20 k
embeddings, pair-generation families) — can each take many minutes in
DuckDB. This wrapper fans the per-query compares out over a process
pool with a per-query timeout, so one slow oracle can't stall the
sweep, and writes a machine-readable summary.

Usage: python3 check_scale.py <verify_out_dir> <sf_dir> [--timeout SEC]
         [--jobs N] [--out SUMMARY.json] [--only a,b,c]
Each worker invokes `python3 check.py <out> <sf> <query>` (the existing
single-query filter path), so the compare logic itself stays in ONE
place.
"""
import argparse
import json
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor


def run_one(args, name):
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "check.py"),
             args.out_dir, args.sf_dir, name],
            capture_output=True, text=True, timeout=args.timeout)
        wall = time.time() - t0
        ok = p.returncode == 0
        # check.py prints one PASS/FAIL line per query + a summary line
        detail = next((l for l in p.stdout.splitlines()
                       if l.startswith(("PASS", "FAIL"))), p.stdout.strip()[:200])
        return name, ("pass" if ok else "fail"), wall, detail
    except subprocess.TimeoutExpired:
        return name, "timeout", time.time() - t0, f"oracle compare exceeded {args.timeout}s"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("sf_dir")
    ap.add_argument("--timeout", type=float, default=1800)
    ap.add_argument("--jobs", type=int, default=8)
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    names = sorted(json.load(open(f"{args.out_dir}/oracle_sql.json")))
    if args.only:
        only = set(args.only.split(","))
        names = [n for n in names if n in only]
    results = {}
    with ThreadPoolExecutor(max_workers=args.jobs) as pool:
        for name, status, wall, detail in pool.map(
                lambda n: run_one(args, n), names):
            results[name] = {"status": status, "wall_s": round(wall, 1),
                             "detail": detail}
            print(f"{status.upper():7s} {wall:7.1f}s {name}: {detail}")
    counts = {}
    for r in results.values():
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    print(f"\n{counts}")
    if args.out:
        json.dump({"counts": counts, "queries": results},
                  open(args.out, "w"), indent=1, sort_keys=True)
    sys.exit(0 if counts.get("fail", 0) == 0 else 1)


if __name__ == "__main__":
    main()
