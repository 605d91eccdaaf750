#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py [sfDir] [outDir]

Loads each <outDir>/<name>.parquet written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB (bare table
names mapped to <sfDir>/<table>.parquet), and compares values with columns
and rows sorted.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    with open(f"{out_dir}/oracle_sql.json") as fh:
        oracles = json.load(fh)

    n_pass = n_fail = 0
    for name in sorted(oracles):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
            ).df()
            want = con.sql(oracles[name]).df()
            g, w = norm(got), norm(want)
            if list(g.columns) != list(w.columns):
                raise AssertionError(f"columns {list(g.columns)} != {list(w.columns)}")
            if len(g) != len(w):
                raise AssertionError(f"rows {len(g)} != {len(w)}")
            # The driver hashes rendered values, so an int column on one
            # side vs a float column on the other (e.g. DuckDB HUGEINT ->
            # float64) hash-mismatches even when values agree. Mirror that:
            # integer-vs-float kind drift is a failure here too.
            for c in g.columns:
                gk, wk = g[c].dtype.kind, w[c].dtype.kind
                if {gk, wk} <= {"i", "u", "f"} and ("f" in (gk, wk)) != (gk == wk == "f"):
                    raise AssertionError(
                        f"dtype kind drift on '{c}': spark={g[c].dtype} oracle={w[c].dtype}"
                    )
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except Exception as e:  # noqa: BLE001
            msg = str(e).replace("\n", " | ")[:400]
            print(f"FAIL {name}: {msg}")
            n_fail += 1

    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
