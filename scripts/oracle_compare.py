"""Shared Spark↔DuckDB oracle comparison — the one implementation behind
both ``scripts/check_oracles.py`` (CLI replica of the driver gate) and
``tests/test_oracles_all.py`` (the pytest-visible all-queries gate, so a
regression in a query the driver never samples can't hide)."""

from __future__ import annotations

import pandas as pd


def norm_df(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-compare normal form: columns sorted by name, ints widened,
    floats rounded to 6dp, datetimes stringified, rows sorted."""
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


def register_views(con, tables, sf_dir: str) -> None:
    import duckdb

    for t in tables:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        except duckdb.IOException:
            pass


def compare_one(spark, con, fn, sql: str | None, sf_dir: str) -> dict:
    """Run one queries() entry vs its oracle SQL; returns the driver-style
    result row (rows/schema/values match booleans + counts)."""
    sdf = fn(spark, sf_dir).toPandas()
    if sql is None:
        return {
            "rows_only": True,
            "spark_rows": len(sdf),
            "ok": True,
        }
    odf = con.execute(sql).fetchdf()
    s, o = norm_df(sdf), norm_df(odf)
    ok_rows = len(s) == len(o)
    ok_cols = list(s.columns) == list(o.columns)
    ok_vals = ok_rows and ok_cols and s.equals(o)
    return {
        "rows_only": False,
        "spark_rows": len(s),
        "oracle_rows": len(o),
        "rows_match": ok_rows,
        "schema_match": ok_cols,
        "values_match": ok_vals,
        "cols_s": list(s.columns),
        "cols_d": list(o.columns),
        "ok": ok_vals,
        "s": s,
        "o": o,
    }
