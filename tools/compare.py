#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query dir in outDir, loads the Spark parquet result, runs the
oracle SQL (outDir/oracle_sql.json) in DuckDB over the same testdata
parquet, sorts columns by name + rows by all columns, and diffs.

Dev-only tool (driver-side python); the engine itself is Scala/Spark.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    failures = []
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            failures.append((name, "no spark output"))
            print(f"FAIL {name}: spark output missing")
            continue
        got = canon(pd.read_parquet(qdir))
        try:
            exp = canon(con.execute(oracle[name]).df())
        except Exception as e:
            failures.append((name, f"oracle error: {e}"))
            print(f"FAIL {name}: oracle SQL error: {e}")
            continue
        if list(got.columns) != list(exp.columns):
            failures.append((name, "columns"))
            print(f"FAIL {name}: columns spark={list(got.columns)} duck={list(exp.columns)}")
            continue
        if len(got) != len(exp):
            failures.append((name, "rowcount"))
            print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}")
            continue
        diffs = []
        for c in got.columns:
            a, b = got[c], exp[c]
            if a.dtype.kind == "M" or b.dtype.kind == "M":
                a = pd.to_datetime(a).astype("datetime64[us]")
                b = pd.to_datetime(b).astype("datetime64[us]")
                eq = a.equals(b)
            elif a.dtype.kind == "f" or b.dtype.kind == "f":
                af = a.astype(float)
                bf = b.astype(float)
                eq = ((af == bf) | (af.isna() & bf.isna())).all()
            else:
                eq = a.astype(object).equals(b.astype(object))
            if not eq:
                diffs.append(c)
        if diffs:
            failures.append((name, f"values: {diffs}"))
            print(f"FAIL {name}: value mismatch in {diffs}")
            for c in diffs[:2]:
                m = (got[c].astype(object) != exp[c].astype(object))
                idx = m[m].index[:3]
                for i in idx:
                    print(f"    row {i} col {c}: spark={got[c][i]!r} duck={exp[c][i]!r}")
        else:
            print(f"PASS {name} ({len(got)} rows)")
    # queries with spark output but no oracle → rows-only check
    for qdir in sorted(Path(out_dir).iterdir()):
        if qdir.is_dir() and qdir.name not in oracle:
            n = len(pd.read_parquet(qdir))
            status = "PASS" if n > 0 else "FAIL"
            print(f"{status} {qdir.name} (rows-only: {n} rows)")
            if n == 0:
                failures.append((qdir.name, "rows-only: 0 rows"))
    print(f"\n{len(oracle) - len([f for f in failures if f[0] in oracle])}/"
          f"{len(oracle)} oracle queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
