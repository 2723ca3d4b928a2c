"""Unit tests for operators/sampling.py (deterministic stratified sample)."""

from __future__ import annotations

import hashlib

from entity_resolution_spark.operators.sampling import (
    hash_stratified_sample,
    rate_threshold,
    sample_hash,
)


def _py_hash(salt: str, i: int) -> int:
    return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:15], 16)


def test_sample_hash_matches_python_md5(spark):
    from pyspark.sql import functions as F

    df = spark.range(20).select(F.col("id"))
    got = {
        r["id"]: r["h"]
        for r in df.withColumn("h", sample_hash(F.col("id"), "s1")).collect()
    }
    assert got == {i: _py_hash("s1", i) for i in range(20)}


def test_stratified_rates_and_determinism(spark):
    from pyspark.sql import functions as F

    df = spark.range(40_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "web").otherwise("code").alias("src"),
    )
    rates = {"web": 0.5, "code": 0.1}
    kept = hash_stratified_sample(df, rates, "src", "doc_id")
    counts = {
        r["src"]: r["n"]
        for r in kept.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    # binomial(20000, p): 4 sigma tolerance
    assert abs(counts["web"] - 10_000) < 4 * (20_000 * 0.25) ** 0.5
    assert abs(counts["code"] - 2_000) < 4 * (20_000 * 0.09) ** 0.5
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(
        r["doc_id"]
        for r in hash_stratified_sample(
            df.repartition(13), rates, "src", "doc_id"
        ).collect()
    )
    assert a == b  # partitioning-independent


def test_raising_rate_is_monotone_and_salt_redraws(spark):
    from pyspark.sql import functions as F

    df = spark.range(5_000).select(
        F.col("id").alias("doc_id"), F.lit("web").alias("src")
    )

    def ids(rate, salt="mix-v1"):
        return {
            r["doc_id"]
            for r in hash_stratified_sample(
                df, {"web": rate}, "src", "doc_id", salt=salt
            ).collect()
        }

    low, high = ids(0.2), ids(0.6)
    assert low < high  # strict superset: a top-up keeps every prior row
    other = ids(0.2, salt="mix-v2")
    assert other != low  # new salt = independent draw

    # absent stratum falls back to default_rate=0 -> dropped entirely
    df2 = df.withColumn("src", F.lit("unknown"))
    assert (
        hash_stratified_sample(df2, {"web": 1.0}, "src", "doc_id").count() == 0
    )


def test_rate_threshold_bounds():
    import pytest

    assert rate_threshold(0.0) == 0
    assert rate_threshold(1.0) == 1 << 60
    with pytest.raises(ValueError):
        rate_threshold(1.5)


def test_collect_strata_cardinality_cap(spark):
    import pytest
    from pyspark.sql import functions as F

    from entity_resolution_spark.operators.sampling import collect_strata

    df = spark.range(100).select(F.col("id").cast("string").alias("s"))
    with pytest.raises(ValueError, match="max_strata"):
        collect_strata(df, "s", max_strata=10)
    vals = collect_strata(df, "s", max_strata=200)
    assert len(vals) == 100
