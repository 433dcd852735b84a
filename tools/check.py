#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
runs each oracle SQL in DuckDB over the sf parquet tables and compares
against the Verify.scala parquet dumps (columns sorted by name, values
hash-compared). Dev-only — NOT part of the shipped engine.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison: everything to string with float rounding
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            out[c] = s.round(6).astype(str)
        else:
            out[c] = s.astype(str)
    return out


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            want = con.sql(sql).df()
            g, w = norm(got), norm(want)
            schema_ok = list(g.columns) == list(w.columns)
            rows_ok = len(g) == len(w)
            exact = schema_ok and rows_ok and g.equals(w)
            sorted_eq = (schema_ok and rows_ok and
                         g.sort_values(list(g.columns)).reset_index(drop=True).equals(
                             w.sort_values(list(w.columns)).reset_index(drop=True)))
            status = "PASS" if exact else ("PASS(sorted)" if sorted_eq else "FAIL")
            if exact or sorted_eq:
                n_pass += 1
            else:
                n_fail += 1
            print(f"{status:13s} {name:32s} rows={len(g)}/{len(w)} schema_ok={schema_ok}")
            if status == "FAIL" and schema_ok and rows_ok:
                diff = (g != w).any(axis=0)
                bad = [c for c in g.columns if diff[c]]
                print(f"              mismatching cols: {bad}")
                for c in bad[:2]:
                    m = (g[c] != w[c])
                    print(f"              {c}: got={g[c][m].head(3).tolist()} want={w[c][m].head(3).tolist()}")
            elif status == "FAIL":
                print(f"              got cols={list(g.columns)}")
                print(f"              want cols={list(w.columns)}")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"ERROR         {name}: {e}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
