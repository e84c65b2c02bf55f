"""Local mirror of the driver's correctness gate: run every queries()
entry at sf0.01 and compare row-count + column names + order-insensitive
value hash against oracle_sql() via DuckDB.

Usage: python BENCH/check_oracle.py [sf_dir] [query ...]
       python BENCH/check_oracle.py [sf_dir] --json OUT.json
         also writes a machine-readable record in the driver's
         CORRECTNESS row shape (rows_match/schema_match/hash_match/
         spark_rows/oracle_rows/err; rows-only queries get
         err="no_oracle") — recorded per round as
         CORRECTNESS_local_r{N}.json (VERDICT r2 item 5).
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import ray

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> int:
    df = canon(df.copy())
    h = 0
    for c in df.columns:
        col = df[c]
        if col.dtype == np.float64:
            vals = col.to_numpy(np.float64).view(np.int64)
        else:
            vals = pd.util.hash_pandas_object(col, index=False).to_numpy()
        h ^= int(pd.util.hash_pandas_object(pd.Series(vals), index=False).sum()) & (
            2**63 - 1
        )
    return h


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    record: dict[str, dict] = {}
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            record[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": None, "oracle_rows": None,
                "err": f"{type(e).__name__}: {e}",
            }
            failures += 1
            continue
        if name not in osql:
            print(f"rows  {name}: {len(got)} rows, cols={sorted(got.columns)} (rows-only)")
            record[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(got), "oracle_rows": None, "err": "no_oracle",
            }
            continue
        want = con.sql(osql[name]).df()
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(want)
        status = "OK  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        record[name] = {
            "rows_match": ok_rows, "schema_match": ok_cols, "hash_match": ok_hash,
            "spark_rows": len(got), "oracle_rows": len(want), "err": None,
        }
        if status == "FAIL":
            failures += 1
        print(
            f"{status}  {name}: rows {len(got)}/{len(want)} cols_match={ok_cols} hash_match={ok_hash}"
        )
        if not ok_cols:
            print(f"      got  cols: {sorted(got.columns)}")
            print(f"      want cols: {sorted(want.columns)}")
        if ok_rows and ok_cols and not ok_hash:
            g, w = canon(got.copy()), canon(want.copy())
            diff_cols = [
                c
                for c in g.columns
                if not (
                    np.array_equal(
                        g[c].to_numpy(np.float64).view(np.int64),
                        w[c].to_numpy(np.float64).view(np.int64),
                    )
                    if g[c].dtype == np.float64
                    else g[c].equals(w[c])
                )
            ]
            print(f"      differing cols: {diff_cols}")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(record, f, indent=2)
        print(f"wrote {json_out} ({len(record)} rows)")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
