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


def threshold_metrics(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "is_match",
    threshold: float = 0.7,
) -> DataFrame:
    """E5: binary classification metrics at ``score >= threshold``.

    Reference ``evaluate_pair_contrast.py:327-343,420-448`` (threshold 0.7,
    ``config.py:93``): precision/recall/accuracy/F1 + confusion counts.
    One aggregation; streams at any scale.
    """
    pred = (F.col(score_col) >= F.lit(threshold)).cast("int")
    y = F.col(label_col).cast("int")
    agg = scored.agg(
        F.sum(pred * y).alias("tp"),
        F.sum(pred * (1 - y)).alias("fp"),
        F.sum((1 - pred) * y).alias("fn"),
        F.sum((1 - pred) * (1 - y)).alias("tn"),
    )
    return agg.select(
        "tp", "fp", "fn", "tn",
        F.round(F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1)), 6).alias("precision"),
        F.round(F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1)), 6).alias("recall"),
        F.round(
            (F.col("tp") + F.col("tn"))
            / F.greatest(F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn"), F.lit(1)),
            6,
        ).alias("accuracy"),
    )


def auroc(
    scored: DataFrame, score_col: str = "score", label_col: str = "is_match"
) -> DataFrame:
    """AUROC via the rank-sum (Mann-Whitney U) identity — two shuffles total.

    AUROC = (R_pos − n_pos(n_pos+1)/2) / (n_pos·n_neg), with average ranks
    for score ties (dense ranking would bias; ``rank`` + count/2 correction
    handles ties exactly like the standard definition).
    """
    from pyspark.sql import Window

    w = Window.orderBy("s")
    # average rank per tie group = rank + (count-1)/2
    ranked = scored.select(
        F.col(score_col).alias("s"), F.col(label_col).cast("int").alias("y")
    ).withColumn("r0", F.rank().over(w)).withColumn(
        "cnt", F.count("*").over(Window.partitionBy("s"))
    ).withColumn("r", F.col("r0") + (F.col("cnt") - 1) / 2.0)
    agg = ranked.agg(
        F.sum(F.col("r") * F.col("y")).alias("rpos"),
        F.sum("y").alias("npos"),
        F.sum(1 - F.col("y")).alias("nneg"),
    )
    return agg.select(
        F.round(
            (F.col("rpos") - F.col("npos") * (F.col("npos") + 1) / 2.0)
            / F.greatest(F.col("npos") * F.col("nneg"), F.lit(1)),
            6,
        ).alias("auroc")
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
