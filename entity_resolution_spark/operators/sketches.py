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


# --- HyperLogLog with reproducible arithmetic -------------------------------

#: Register-index bits (m = 256 registers) and remaining hash width.
_HLL_P = 8
_HLL_M = 1 << _HLL_P
_HLL_W = 60 - _HLL_P  # 52 value bits
#: Flajolet et al. 2007 bias constant for m >= 128.
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)


def hll_distinct_estimate(df: DataFrame, col: str) -> DataFrame:
    """One-row HyperLogLog distinct estimate with engine-exact state.

    Where KMV above needs a driver-side k-row TakeOrdered merge, HLL state
    is a 256-register ``max`` aggregate — associative, commutative, fully
    map-side combinable, and *order-invariant by construction*: the right
    sketch shape for a 100 TB scan (the whole state is 256 bytes per
    partial, merged in the shuffle like any max).

    Reproducibility (the reason not to use ``approx_count_distinct``,
    whose HLL++ hashing is engine-private): the hash is the same 60-bit
    md5 prefix as KMV; register = top 8 bits, rho = leading-zero count of
    the remaining 52 bits + 1 (computed by string position over a
    zero-padded binary rendering — identical in Java and DuckDB).  The
    harmonic-mean denominator ``sum(2^-rho)`` is kept EXACT by scaling to
    integers (``2^(53-rho)`` fits a long; absent registers contribute
    ``2^53`` each), so the only floats are one final division and, in the
    small-range regime, one ``ln`` — both deterministic at 6dp output.

    Returns ``(m, n_zero_registers, s_scaled, est_distinct)``; ``s_scaled``
    is the exact integer sketch checksum (strong oracle evidence).
    """
    h = F.conv(F.substring(F.md5(F.col(col)), 1, 15), 16, 10).cast("bigint")
    bucket = F.shiftright(h, _HLL_W)
    w = h.bitwiseAND(F.lit((1 << _HLL_W) - 1))
    first_one = F.instr(F.lpad(F.bin(w), _HLL_W, "0"), "1")
    rho = F.when(first_one == 0, F.lit(_HLL_W + 1)).otherwise(first_one)
    regs = (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    # Exact integer denominator: sum(2^(53 - m_j)) over present registers
    # plus 2^53 per absent register (m_j = 0).
    agg = regs.agg(
        F.count("*").alias("_present"),
        # coalesce: on an EMPTY input the sum over zero register rows is
        # NULL and would propagate through s_scaled/est_distinct; the
        # correct empty-sketch state is all-m zero registers → est 0.
        F.coalesce(
            F.sum(F.expr("shiftleft(cast(1 as bigint), 53 - m_j)")),
            F.lit(0),
        )
        .cast("bigint")
        .alias("_s_present"),
    ).select(
        F.lit(_HLL_M).cast("long").alias("m"),
        (F.lit(_HLL_M) - F.col("_present")).cast("long").alias(
            "n_zero_registers"
        ),
        (
            F.col("_s_present")
            + (F.lit(_HLL_M) - F.col("_present")) * F.lit(1 << 53)
        ).cast("long").alias("s_scaled"),
    )
    raw_est = (
        F.lit(_HLL_ALPHA * _HLL_M * _HLL_M * float(1 << 53))
        / F.col("s_scaled")
    )
    # Small-range (linear counting) correction per Flajolet et al. 2007.
    lin_est = F.lit(float(_HLL_M)) * F.log(
        F.lit(float(_HLL_M)) / F.col("n_zero_registers")
    )
    return agg.select(
        "m",
        "n_zero_registers",
        "s_scaled",
        F.round(
            F.when(
                (raw_est <= F.lit(2.5 * _HLL_M))
                & (F.col("n_zero_registers") > 0),
                lin_est,
            ).otherwise(raw_est),
            6,
        ).alias("est_distinct"),
    )
