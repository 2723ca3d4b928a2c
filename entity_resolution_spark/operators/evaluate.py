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
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "is_match",
    n_bins: int = 64,
) -> DataFrame:
    """Exact AUROC via the Mann-Whitney probability identity — no global window.

    AUROC = P(s_pos > s_neg) + ½·P(s_pos = s_neg)
          = Σ_g pos_g · (neg_strictly_below_g + ½·neg_g) / (n_pos·n_neg)

    summed over distinct-score groups ``g`` — algebraically identical to the
    tie-corrected rank-sum (R_pos − n_pos(n_pos+1)/2)/(n_pos·n_neg) but
    computed without ranking individual rows:

    1. ``groupBy(score)`` collapses the (possibly huge) scored-pair table to
       one row per distinct score — a map-side-combinable hash aggregate.
    2. Distinct scores are range-binned by ~``n_bins`` approx-quantile
       boundaries; the running negative count is a **partitioned** window
       within each bin (never the single-partition ``Window.orderBy`` that
       Spark warns about) plus a per-bin offset from a tiny (≤ n_bins rows)
       collected totals table.

    Exact regardless of bin boundaries (bins only partition the work), so the
    result still hash-matches the oracle's rank-based SQL.

    Rows with a NULL score are dropped (a NULL has no place in a ranking);
    the per-score aggregate is localCheckpoint-ed — released by the context
    cleaner when the result goes out of scope, unlike ``cache`` which pins
    blocks for the session lifetime.
    """
    from pyspark.sql import Window

    from ..functions.maps import prefix_offset_expr

    y = F.col(label_col).cast("int")
    g = (
        scored.where(F.col(score_col).isNotNull())
        .select(F.col(score_col).alias("s"), y.alias("y"))
        .groupBy("s")
        .agg(F.sum("y").alias("pos"), F.sum(1 - F.col("y")).alias("neg"))
    )
    g = g.localCheckpoint(eager=True)
    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = sorted(set(b for b in g.approxQuantile("s", qs, 0.001) if b is not None))
    if bounds:
        bin_expr = sum(
            ((F.col("s") > F.lit(b)).cast("int") for b in bounds), F.lit(0)
        )
    else:
        bin_expr = F.lit(0)
    gb = g.withColumn("bin", bin_expr)
    # strictly-below cumulative negatives within each bin (partitioned window)
    w_in = (
        Window.partitionBy("bin")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    gb = gb.withColumn("cumneg_in", F.coalesce(F.sum("neg").over(w_in), F.lit(0)))
    # per-bin totals: ≤ n_bins rows — a bounded driver-side prefix sum
    totals = {r["bin"]: r["bneg"] for r in
              gb.groupBy("bin").agg(F.sum("neg").alias("bneg")).collect()}
    off_expr = prefix_offset_expr(totals, F.col("bin"))
    agg = gb.agg(
        F.sum(
            F.col("pos") * (off_expr + F.col("cumneg_in") + F.col("neg") / 2.0)
        ).alias("num"),
        F.sum("pos").alias("npos"),
        F.sum("neg").alias("nneg"),
    )
    return agg.select(
        F.round(
            F.col("num") / F.greatest(F.col("npos") * F.col("nneg"), F.lit(1)),
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
