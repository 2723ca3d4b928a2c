"""Local replica of the driver's correctness check: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count + sorted
value hash (columns sorted by name, rows sorted, values stringified).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd


def norm_df(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.astype(str)
        elif str(col.dtype).startswith(("int", "uint")):
            df[c] = col.astype("int64")
        elif str(col.dtype).startswith("float"):
            df[c] = col.round(6)
        elif "datetime" in str(col.dtype):
            df[c] = col.astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from entity_resolution_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    # spill outside the repo: big oracles (keep-list at sf0.1) out-of-core
    # to ./.tmp otherwise — 32 GB of temp landed inside the git tree once
    con = duckdb.connect(config={"temp_directory": "/tmp/duckdb_spill"})
    for t in entry_mod.TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        except duckdb.IOException:
            pass

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:28s} SPARK ERROR: {str(e).splitlines()[0][:140]}")
            continue
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(sdf)} rows")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:28s} ORACLE ERROR: {str(e).splitlines()[0][:140]}")
            continue
        s, o = norm_df(sdf), norm_df(odf)
        ok_rows = len(s) == len(o)
        ok_cols = list(s.columns) == list(o.columns)
        ok_vals = ok_rows and ok_cols and s.equals(o)
        status = "OK" if ok_vals else "MISMATCH"
        if not ok_vals:
            failures.append(name)
        print(f"{name:28s} {status}  spark={len(s)} duck={len(o)} cols_s={list(s.columns)} cols_d={list(o.columns)}")
        if not ok_vals and ok_rows and ok_cols:
            diff = (s != o).any(axis=1)
            print("  first diffs:")
            print(pd.concat([s[diff].head(3), o[diff].head(3)], keys=["spark", "duck"]))
    spark.stop()
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
