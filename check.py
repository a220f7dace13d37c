#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only — the
shipped library is pure Scala; this script just replays the DuckDB-oracle
comparison so we can iterate without waiting for the driver).

Usage: python3 check.py <verify_out_dir> <sf_dir>
  where verify_out_dir was produced by `sbt "runMain graft.Verify <sf_dir> <out>"`.

For each query: load Spark's parquet result and DuckDB's oracle result,
sort columns by name, sort rows, compare values exactly (with a tiny
float tolerance fallback reported separately).
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def celleq(a, b):
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            return a == b or math.isclose(float(a), float(b), rel_tol=0, abs_tol=0)
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # at-scale sweeps run many compares in parallel (check_scale.py);
    # uncapped per-process DuckDB thread pools oversubscribe the box
    if os.environ.get("DUCKDB_THREADS"):
        con.sql(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
    # likewise cap per-process memory: DuckDB's default budget is a
    # fraction of TOTAL RAM, so N parallel workers oversubscribe and
    # the kernel OOM-kills the biggest one mid-compare (observed on the
    # sf1 mm_canonical CTE at ~39 GB RSS); a cap makes DuckDB spill
    # instead
    if os.environ.get("DUCKDB_MEMORY"):
        con.sql(f"SET memory_limit='{os.environ['DUCKDB_MEMORY']}'")
        con.sql(f"SET temp_directory='/tmp/duckdb_spill_{os.getpid()}'")
    for t in TABLES:
        # driver corpus ships single parquet FILES; ScaleGen writes
        # parquet DIRECTORIES (part files) — glob the latter
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if len(sys.argv) > 3:  # optional query-name filter for dev iteration
        only = set(sys.argv[3].split(","))
        oracles = {k: v for k, v in oracles.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs oracle {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(exp)}")
            n_fail += 1
            continue
        bad = []
        for col in got.columns:
            ga, ea = got[col].tolist(), exp[col].tolist()
            for i, (a, b) in enumerate(zip(ga, ea)):
                if not celleq(a, b):
                    bad.append((col, i, a, b))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell mismatches, e.g. {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows x {len(got.columns)} cols)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
