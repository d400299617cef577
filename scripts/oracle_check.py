#!/usr/bin/env python3
"""Local pre-flight of the driver's DuckDB oracle compare.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

Mirrors the driver contract: for each query with an oracleSql entry, run the
SQL in DuckDB against the parquet tables of <sfDir>, load the Spark result
parquet from <verifyOutDir>/<name>, sort columns by name, sort rows, and
compare values cell-by-cell (floats to 9 significant digits).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            want = canon(con.sql(sql).df())
            got = canon(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: exception {e}")
            n_bad += 1
            continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_bad += 1
            continue
        bad = None
        for c in want.columns:
            wv = [cell(x) for x in want[c].tolist()]
            gv = [cell(x) for x in got[c].tolist()]
            if wv != gv:
                i = next(i for i in range(len(wv)) if wv[i] != gv[i])
                bad = (c, i, gv[i], wv[i])
                break
        if bad:
            c, i, g, w = bad
            print(f"FAIL {name}: col {c} row {i}: got {g} want {w}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(want)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
