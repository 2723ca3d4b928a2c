"""Local replica of the driver's correctness check: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count + sorted
value hash (columns sorted by name, rows sorted, values stringified).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]

The comparison itself lives in scripts/oracle_compare.py, shared with the
pytest gate tests/test_oracles_all.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb
import pandas as pd

from oracle_compare import compare_one, register_views


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from entity_resolution_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    # spill outside the repo: big oracles (keep-list at sf0.1) out-of-core
    # to ./.tmp otherwise — 32 GB of temp landed inside the git tree once
    con = duckdb.connect(config={"temp_directory": "/tmp/duckdb_spill"})
    register_views(con, entry_mod.TABLES, sf_dir)

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            r = compare_one(spark, con, fn, oracles.get(name), sf_dir)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:28s} ERROR: {str(e).splitlines()[0][:140]}")
            continue
        if r["rows_only"]:
            print(f"{name:28s} rows-only: {r['spark_rows']} rows")
            continue
        status = "OK" if r["ok"] else "MISMATCH"
        if not r["ok"]:
            failures.append(name)
        print(
            f"{name:28s} {status}  spark={r['spark_rows']} duck={r['oracle_rows']}"
            f" cols_s={r['cols_s']} cols_d={r['cols_d']}"
        )
        if not r["ok"] and r["rows_match"] and r["schema_match"]:
            s, o = r["s"], r["o"]
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
