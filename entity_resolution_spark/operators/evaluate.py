"""Pairwise precision/recall/F1 over canonical (min,max) pairs.

Reference ``block_klsh/clustering/perf_metrics.py:9-26``:
    tp = |pred ∩ true|, fp = |pred − true|, fn = |true − pred|
computed there with Python sets; here with a full outer join so it streams at
any scale.  F1 uses the reference's exact guard: 0 when precision*recall == 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonicalize_pairs(df: DataFrame, c1: str = "id1", c2: str = "id2") -> DataFrame:
    return df.select(
        F.least(c1, c2).alias("id1"), F.greatest(c1, c2).alias("id2")
    ).distinct()


def clusters_to_pairs(assignment: DataFrame, cluster_col: str = "component_id") -> DataFrame:
    """All i<j pairs within each predicted cluster (ref klsh_engine.py:213-225).

    Cluster-local self-join — same pattern as block-local pair generation.
    """
    a = assignment.alias("l")
    b = assignment.alias("r")
    return (
        a.join(b, on=cluster_col)
        .where(F.col("l.record_id") < F.col("r.record_id"))
        .select(F.col("l.record_id").alias("id1"), F.col("r.record_id").alias("id2"))
    )


def pairwise_metrics(pred_pairs: DataFrame, true_pairs: DataFrame) -> DataFrame:
    """One-row DataFrame (tp, fp, fn, precision, recall, f1)."""
    p = canonicalize_pairs(pred_pairs).withColumn("_p", F.lit(1))
    t = canonicalize_pairs(true_pairs).withColumn("_t", F.lit(1))
    joined = p.join(t, ["id1", "id2"], "full")
    counts = joined.agg(
        F.sum(F.when(F.col("_p").isNotNull() & F.col("_t").isNotNull(), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("_p").isNotNull() & F.col("_t").isNull(), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("_p").isNull() & F.col("_t").isNotNull(), 1).otherwise(0)).alias("fn"),
    )
    return counts.select(
        "tp",
        "fp",
        "fn",
        (F.col("tp") / F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") + F.col("fp"))).alias("_pr"),
        (F.col("tp") / F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") + F.col("fn"))).alias("_rc"),
    ).select(
        "tp",
        "fp",
        "fn",
        F.coalesce(F.col("_pr"), F.lit(0.0)).alias("precision"),
        F.coalesce(F.col("_rc"), F.lit(0.0)).alias("recall"),
        F.coalesce(
            F.when(
                F.col("_pr") * F.col("_rc") > 0,
                2 * F.col("_pr") * F.col("_rc") / (F.col("_pr") + F.col("_rc")),
            ),
            F.lit(0.0),
        ).alias("f1"),
    )
