"""Shared Spark↔DuckDB oracle comparison — the one implementation behind
both ``scripts/check_oracles.py`` (CLI replica of the driver gate) and
``tests/test_oracles_all.py`` (the pytest-visible all-queries gate, so a
regression in a query the driver never samples can't hide)."""

from __future__ import annotations

import threading

import pandas as pd

#: row-separator / null-sentinel shared by both engines' canonical row strings
_SEP = "\x1f"
_NULL = "\x01__NULL__"


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


# ---------------------------------------------------------------------------
# distributed checksum compare — for results too large to collect
# ---------------------------------------------------------------------------
#
# At sf1 the quadratic-output queries (candidate pairs, edge tables) return
# tens of millions of rows; collecting both sides to pandas blows
# spark.driver.maxResultSize. Instead each engine reduces its result to
# (row count, two independently-salted bit_xor checksums of a canonical
# per-row string) — columns sorted by name, ints as decimal strings, floats
# re-rounded to 6dp then %.6f-formatted, timestamps as epoch-micros, NULL as
# a sentinel — using the same 60-bit md5 idiom (conv(substr(md5(x),1,15)) /
# ('0x'||substr(md5(x),1,15))::BIGINT) the oracle dialect already shares.
# Values are already quantized in-query on both sides (repo invariant), so
# the extra round-then-format step never sits near a decimal midpoint and
# the two engines' printf paths agree; `+ 0.0` collapses -0.0 to +0.0.


def _spark_canon_exprs(df):
    """Sorted-by-name canonical string expressions, or None if the schema
    has a non-primitive column (caller must fall back to collect)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    exprs = {}
    for f in df.schema.fields:
        c = F.col(f.name)
        t = f.dataType
        if isinstance(t, T.StringType):
            e = c
        elif isinstance(
            t, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
        ):
            e = c.cast("long").cast("string")
        elif isinstance(t, (T.DoubleType, T.FloatType, T.DecimalType)):
            cd = c.cast("double")
            e = (
                F.when(c.isNull(), F.lit(None).cast("string"))
                .when(F.isnan(cd), F.lit("NaN"))
                .otherwise(
                    F.format_string("%.6f", F.round(cd, 6) + F.lit(0.0))
                )
            )
        elif isinstance(t, T.BooleanType):
            e = c.cast("int").cast("string")
        elif isinstance(t, (T.TimestampType, T.TimestampNTZType)):
            # zero-padded 6-digit-micros text on both sides; ltz renders in
            # the session tz (pinned UTC in session.py), matching DuckDB's
            # naive TIMESTAMP strftime
            e = F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
        elif isinstance(t, T.DateType):
            e = c.cast("string")
        else:
            return None
        exprs[f.name] = e
    return [exprs[n] for n in sorted(exprs)]


def _duck_canon_exprs(cols: list[tuple[str, str]]):
    """Canonical string SQL per (name, duckdb_type), sorted by name, or
    None on a non-primitive column."""
    exprs = {}
    for name, typ in cols:
        q = '"' + name.replace('"', '""') + '"'
        t = typ.upper()
        if t.startswith("VARCHAR"):
            e = q
        elif t in (
            "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "HUGEINT",
            "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT",
        ):  # NOT a substring match: INTERVAL must fall back, not bind-error
            e = f"CAST(CAST({q} AS BIGINT) AS VARCHAR)"
        elif t.startswith(("DOUBLE", "FLOAT", "REAL", "DECIMAL")):
            e = (
                f"CASE WHEN {q} IS NULL THEN NULL "
                f"WHEN isnan(CAST({q} AS DOUBLE)) THEN 'NaN' "
                f"ELSE printf('%.6f', round(CAST({q} AS DOUBLE), 6) + 0.0) END"
            )
        elif t.startswith("BOOLEAN"):
            e = f"CAST(CAST({q} AS INTEGER) AS VARCHAR)"
        elif t.startswith("TIMESTAMP"):
            e = f"strftime({q}, '%Y-%m-%d %H:%M:%S.%f')"
        elif t.startswith("DATE"):
            e = f"CAST({q} AS VARCHAR)"
        else:
            return None
        exprs[name] = e
    return [exprs[n] for n in sorted(exprs)]


def _spark_checksum(df) -> tuple[int, int, int]:
    from pyspark.sql import functions as F

    exprs = _spark_canon_exprs(df)
    row = F.concat_ws(_SEP, *[F.coalesce(e, F.lit(_NULL)) for e in exprs])

    def h(salt: str):
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), row)), 1, 15), 16, 10
        ).cast("long")

    out = (
        df.select(h("s1|").alias("_h1"), h("s2|").alias("_h2"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("coalesce(bit_xor(_h1), 0)").alias("x1"),
            F.expr("coalesce(bit_xor(_h2), 0)").alias("x2"),
        )
        .collect()[0]
    )
    return int(out["n"]), int(out["x1"]), int(out["x2"])


def _duck_checksum(con, sql: str) -> tuple[int, int, int, list[str]] | None:
    con.execute(f"CREATE OR REPLACE TEMP VIEW _cksum_q AS ({sql})")
    cols = [
        (r[0], r[1])
        for r in con.execute("DESCRIBE _cksum_q").fetchall()
    ]
    exprs = _duck_canon_exprs(cols)
    if exprs is None:
        return None
    row = "concat_ws(chr(31), " + ", ".join(
        f"coalesce({e}, chr(1) || '__NULL__')" for e in exprs
    ) + ")"

    def h(salt: str) -> str:
        return f"(('0x' || substr(md5('{salt}' || {row}), 1, 15))::BIGINT)"

    n, x1, x2 = con.execute(
        f"SELECT count(*), coalesce(bit_xor({h('s1|')}), 0), "
        f"coalesce(bit_xor({h('s2|')}), 0) FROM _cksum_q"
    ).fetchone()
    return int(n), int(x1), int(x2), [c[0] for c in cols]


def run_with_timeout(con, thunk, seconds: float | None):
    """Run ``thunk()`` (DuckDB work on ``con``) with an interrupt-based
    timeout; None means no limit. Raises TimeoutError on expiry."""
    if not seconds:
        return thunk()
    result: list = []
    err: list = []

    def target():
        try:
            result.append(thunk())
        except Exception as e:  # noqa: BLE001
            err.append(e)

    t = threading.Thread(target=target, daemon=True)
    t.start()
    t.join(seconds)
    if t.is_alive():
        con.interrupt()
        t.join(30)
        raise TimeoutError(f"oracle exceeded {seconds:.0f}s (interrupted)")
    if err:
        raise err[0]
    return result[0]


def compare_one(
    spark,
    con,
    fn,
    sql: str | None,
    sf_dir: str,
    checksum_rows: int | None = None,
    oracle_timeout: float | None = None,
) -> dict:
    """Run one queries() entry vs its oracle SQL; returns the driver-style
    result row (rows/schema/values match booleans + counts).

    ``checksum_rows``: when set and the Spark result exceeds it (and every
    column is primitive), compare via the distributed checksum instead of
    collecting — required at sf1 where pair tables reach 10^7-10^8 rows.
    ``oracle_timeout``: wall-clock budget for the DuckDB side (CLI sweeps
    only; the pytest gate passes None).
    """
    sdf_spark = fn(spark, sf_dir)
    if checksum_rows is not None and sql is not None:
        if _spark_canon_exprs(sdf_spark) is not None:
            # one Spark pass: the checksum aggregate also yields the row
            # count, so the size probe costs nothing extra; only results
            # small enough to collect pay a (cheap) second execution
            ns, x1s, x2s = _spark_checksum(sdf_spark)
            if ns > checksum_rows:
                duck = run_with_timeout(
                    con, lambda: _duck_checksum(con, sql), oracle_timeout
                )
                if duck is not None:
                    no, x1o, x2o, duck_cols = duck
                    ok_rows = ns == no
                    ok_cols = sorted(sdf_spark.columns) == sorted(duck_cols)
                    ok_vals = (
                        ok_rows and ok_cols and x1s == x1o and x2s == x2o
                    )
                    return {
                        "rows_only": False,
                        "mode": "checksum",
                        "spark_rows": ns,
                        "oracle_rows": no,
                        "rows_match": ok_rows,
                        "schema_match": ok_cols,
                        "values_match": ok_vals,
                        "cols_s": sorted(sdf_spark.columns),
                        "cols_d": sorted(duck_cols),
                        "ok": ok_vals,
                        "s": None,
                        "o": None,
                    }
    sdf = sdf_spark.toPandas()
    if sql is None:
        return {
            "rows_only": True,
            "spark_rows": len(sdf),
            "ok": True,
        }
    odf = run_with_timeout(
        con, lambda: con.execute(sql).fetchdf(), oracle_timeout
    )
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
