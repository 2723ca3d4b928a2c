"""Deterministic distinct-count sketching for corpus-scale statistics.

KMV (k-minimum-values, Bar-Yossef et al. RANDOM'02): keep the ``k`` smallest
normalized hash values of a column's distinct values; the k-th smallest
``h_k`` estimates the distinct count as ``(k-1) / h_k``.  Unlike
``approx_count_distinct`` (HyperLogL++, engine-private hashing) the KMV
sketch here hashes with md5, so the estimate is bit-reproducible across
engines — it can be oracle-checked against DuckDB running the identical
arithmetic, and two clusters scanning the same corpus produce the same
number regardless of partitioning.

Scale shape: one hash-aggregate distinct on the 60-bit hash (map-side
combinable), then Spark's ``orderBy(...).limit(k)`` — which physically runs
as TakeOrdered: per-partition top-k then a k-row driver merge, never a
global sort.  The sketch state is k longs no matter the corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 15 hex chars = 60 bits: fits a signed 64-bit int exactly, and the
# int -> double rounding (IEEE nearest) is identical in every engine.
_TWO_60 = float(1 << 60)


def normalized_hash(col: Column) -> Column:
    """md5-derived hash of ``col`` mapped to a double in [0, 1)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint") / _TWO_60
    )


def kmv_distinct_estimate(
    df: DataFrame, col: str, k: int = 128
) -> DataFrame:
    """One-row DataFrame ``(k, n_kept, kth_hash, est_distinct)`` estimating
    the number of distinct ``col`` values.

    ``est_distinct`` = ``(k-1) / h_k`` rounded to 6dp when at least ``k``
    distinct hashes exist, else the exact kept count (the standard KMV
    small-cardinality fallback).  Hash collisions merge in the distinct
    step, exactly as the estimator assumes.
    """
    kept = (
        df.select(normalized_hash(F.col(col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    return kept.agg(
        F.lit(k).cast("long").alias("k"),
        F.count("*").cast("long").alias("n_kept"),
        F.round(F.max("h"), 6).alias("kth_hash"),
        F.round(
            F.when(F.count("*") >= k, F.lit(k - 1) / F.max("h")).otherwise(
                F.count("*").cast("double")
            ),
            6,
        ).alias("est_distinct"),
    )
