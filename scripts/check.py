#!/usr/bin/env python3
"""Dev-only local replica of the driver's correctness gate.

Usage:
    python3 scripts/check.py [sfDir] [outDir] [--skip-verify] [query...]

Runs `graft.Verify` (unless --skip-verify), then executes each entry of
oracle_sql.json in DuckDB against the same parquet test tables and compares
row counts, column names/types, and sorted values against the Spark output.

NOT part of the shipped library — tooling for the build loop only.
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:  # lists/arrays are unsortable; use tuples
        if df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
            df[c] = df[c].map(lambda v: tuple(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    import numpy as np
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray) or \
            isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
        if a is None or b is None or len(a) != len(b):
            return False
        return all(values_equal(x, y) for x, y in zip(a, b))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list:
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"columns spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"rows spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    s, d = norm(spark_df), norm(duck_df)
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        bad = [i for i, (x, y) in enumerate(zip(sv, dv)) if not values_equal(x, y)]
        if bad:
            i = bad[0]
            problems.append(
                f"col {col}: {len(bad)} mismatches, first at row {i}: "
                f"spark={sv[i]!r} duck={dv[i]!r}")
    return problems


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/graft_verify"
    only = set(args[2:])

    if "--skip-verify" not in flags:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
            cwd="/root/repo", capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-4000:])
            print(r.stderr[-4000:])
            sys.exit(1)
        for line in r.stderr.splitlines():
            if "[verify]" in line:
                print(line)

    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    passed = failed = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pq = Path(f"{out_dir}/{name}")
        if not pq.exists():
            print(f"FAIL {name}: no spark output")
            failed += 1
            continue
        try:
            spark_df = pd.read_parquet(pq)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            failed += 1
            continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0]}")
            failed += 1
            continue
        problems = compare(name, spark_df, duck_df)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            passed += 1
    print(f"\n{passed} passed, {failed} failed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
