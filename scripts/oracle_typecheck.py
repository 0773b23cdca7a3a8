#!/usr/bin/env python3
"""Oracle type audit (VERDICT r7 #2): the driver's hash compare is
type-sensitive, so a DuckDB oracle whose derived column comes out HUGEINT
(any un-cast sum()/`//`/count arithmetic) hash-mismatches a value-correct
Spark LongType output (q136/q137, round 7). This script pins the whole
class shut:

  1. every oracle's DESCRIBE type must be in the canonical set
     (BIGINT, INTEGER, DOUBLE, FLOAT, VARCHAR, BOOLEAN, DATE,
     TIMESTAMP[_NS], BLOB, and LISTs thereof) — no HUGEINT, no DECIMAL,
     no unsigned;
  2. every oracle column's type must agree with the Spark parquet output
     schema for the same query from a `graft.Verify` dump.

Usage:
    python3 scripts/oracle_typecheck.py <verifyOutDir> [sfDir]

<verifyOutDir> is a directory produced by `graft.Verify` (per-query
parquet + oracle_sql.json). Exit 0 = clean; nonzero prints every offender.
NOT part of the shipped library — build-loop tooling only.
"""
import json
import re
import sys
from pathlib import Path

import duckdb
import pyarrow.dataset as pads

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DuckDB type -> canonical lattice tag; absence = non-canonical = offender.
DUCK_CANON = {
    "BIGINT": "i64", "INTEGER": "i32", "DOUBLE": "f64", "FLOAT": "f32",
    "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date",
    "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts", "BLOB": "bin",
}

ARROW_CANON = {
    "int64": "i64", "int32": "i32", "double": "f64", "float": "f32",
    "string": "str", "large_string": "str", "bool": "bool",
    "date32[day]": "date", "timestamp[us]": "ts", "timestamp[ns]": "ts",
    "binary": "bin", "large_binary": "bin",
}


def duck_canon(t: str):
    m = re.fullmatch(r"(.+)\[\]", t)
    if m:
        inner = duck_canon(m.group(1))
        return None if inner is None else f"list<{inner}>"
    return DUCK_CANON.get(t)


def arrow_canon(t: str):
    m = re.fullmatch(r"(?:large_)?list<(?:item|element): (.+?)(?: not null)?>", t)
    if m:
        inner = arrow_canon(m.group(1))
        return None if inner is None else f"list<{inner}>"
    return ARROW_CANON.get(t)


def main():
    out_dir = Path(sys.argv[1])
    sf_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01")
    oracles = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    problems = []
    for name, sql in sorted(oracles.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            problems.append(f"{name}: DESCRIBE failed: {e}")
            continue
        duck_types = {row[0]: row[1] for row in desc}
        for col, dt in duck_types.items():
            if duck_canon(dt) is None:
                problems.append(
                    f"{name}.{col}: non-canonical DuckDB type {dt} "
                    f"(add an explicit ::BIGINT / ::DOUBLE cast)")

        pq_dir = out_dir / name
        if not pq_dir.exists():
            problems.append(f"{name}: no Spark parquet dump in {out_dir}")
            continue
        spark_schema = pads.dataset(str(pq_dir), format="parquet").schema
        spark_types = {f.name: str(f.type) for f in spark_schema}
        if set(spark_types) != set(duck_types):
            problems.append(
                f"{name}: column sets differ — spark {sorted(spark_types)} "
                f"vs oracle {sorted(duck_types)}")
            continue
        for col in spark_types:
            sc, dc = arrow_canon(spark_types[col]), duck_canon(duck_types[col])
            if dc is not None and sc != dc:
                problems.append(
                    f"{name}.{col}: spark {spark_types[col]} ({sc}) vs "
                    f"oracle {duck_types[col]} ({dc})")

    if problems:
        print(f"TYPECHECK: {len(problems)} problem(s) over "
              f"{len(oracles)} oracles")
        for p in problems:
            print(" ", p)
        sys.exit(1)
    print(f"TYPECHECK: clean — {len(oracles)} oracles, all output columns "
          f"canonical and spark/oracle type-aligned")


if __name__ == "__main__":
    main()
