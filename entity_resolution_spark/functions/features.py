"""Feature engineering — quarter-circle embeddings, scalers, weighting (F1-F6).

Reference semantics (re-derived from ``block_klsh/features/features_engineering.py``
and ``clustering/klsh_engine.py:148-198``):

* bool → quarter circle: 0 → (1,0), 1 → (0,1)                (``features_engineering.py:9-19``)
* ordinal v ∈ [0,max] → θ = v/max·π/2 → (cos θ, sin θ)       (``:21-36``)
* date → fraction of [ref, ref+horizon] clamped to [0,1] →
  θ·π/2 → (cos θ, sin θ)                                      (``:38-58``)
* numeric → z-score, fitted *per component* (population std,
  sklearn StandardScaler semantics)                           (``klsh_engine.py:159-161``)
* each engineered column multiplied by its weight             (``klsh_engine.py:164-184``)

All JVM-side column expressions; the per-component scaler uses a window
aggregation over the component id so the "fit" never leaves the executors.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HALF_PI = math.pi / 2.0


def embed_bool(col: Column) -> tuple[Column, Column]:
    """0 → (1,0), anything else → (0,1)."""
    cos = F.when(col.cast("int") == 0, F.lit(1.0)).otherwise(F.lit(0.0))
    sin = F.when(col.cast("int") == 0, F.lit(0.0)).otherwise(F.lit(1.0))
    return cos, sin


def embed_ordinal(col: Column, max_value: int) -> tuple[Column, Column]:
    theta = col.cast("double") / F.lit(float(max_value)) * F.lit(HALF_PI)
    return F.cos(theta), F.sin(theta)


def embed_date(
    col: Column, ref_date: str = "2015-01-01", horizon_days: int = 365 * 60
) -> tuple[Column, Column]:
    """Clamped fraction of [ref, ref+horizon] on a quarter circle."""
    delta_s = col.cast("timestamp").cast("double") - F.to_timestamp(
        F.lit(ref_date)
    ).cast("double")
    frac = F.least(F.greatest(delta_s / F.lit(horizon_days * 86400.0), F.lit(0.0)), F.lit(1.0))
    theta = frac * F.lit(HALF_PI)
    return F.cos(theta), F.sin(theta)


def zscore_per_group(col: Column, group_col: str) -> Column:
    """Population z-score fitted within each group (StandardScaler semantics,
    ddof=0).  Zero-variance groups map to 0.0 (sklearn divides by 1 then)."""
    w = Window.partitionBy(group_col)
    mean = F.avg(col).over(w)
    std = F.stddev_pop(col).over(w)
    return F.when(std > 0, (col - mean) / std).otherwise(F.lit(0.0))


def minmax_neg1_1(col: Column, group_col: str | None = None) -> Column:
    """MinMax scale to [-1, 1] (encoder pipeline, ``feature_engineering.py:58-64``)."""
    w = Window.partitionBy(group_col) if group_col else Window.partitionBy()
    lo, hi = F.min(col).over(w), F.max(col).over(w)
    return F.when(hi > lo, F.lit(-1.0) + 2.0 * (col - lo) / (hi - lo)).otherwise(F.lit(0.0))


def keyed_noise(id_col: Column, scale: float = 0.05, seed: int = 42) -> Column:
    """Deterministic pseudo-Gaussian noise keyed by record id (replaces the
    reference's ``np.random.normal`` train-time noise so results don't depend
    on partitioning).  Sum of 4 keyed uniforms ≈ normal (Irwin-Hall)."""
    us = [
        (F.pmod(F.xxhash64(id_col, F.lit(seed + i)), F.lit(100003)) / F.lit(100003.0))
        for i in range(4)
    ]
    ih = sum(us, F.lit(0.0).cast("double")) - F.lit(2.0)  # mean 0, var 1/3
    return ih * F.lit(scale * math.sqrt(3.0))


def iqr_outlier_report(
    df: DataFrame,
    cols: list[str],
    lower_q: float = 0.15,
    upper_q: float = 0.85,
    k: float = 1.5,
) -> DataFrame:
    """F8: IQR outlier *report* — bounds + counts, no filtering (the reference
    logs and ignores: ``feature_engineering.py:141-142,170-193``).

    Exact interpolated percentiles (``F.percentile``) so the SQL oracle
    (quantile_cont) reproduces the numbers; one aggregation per column batch.
    """
    rows = []
    for c in cols:
        q = df.agg(
            F.percentile(F.col(c), F.lit(lower_q)).alias("lo_q"),
            F.percentile(F.col(c), F.lit(upper_q)).alias("hi_q"),
        ).collect()[0]
        iqr = q["hi_q"] - q["lo_q"]
        lo, hi = q["lo_q"] - k * iqr, q["hi_q"] + k * iqr
        n_out = df.where((F.col(c) < lo) | (F.col(c) > hi)).count()
        rows.append((c, float(round(lo, 6)), float(round(hi, 6)), int(n_out)))
    return df.sparkSession.createDataFrame(
        rows, "feature string, lower_bound double, upper_bound double, n_outliers long"
    )


@dataclass(frozen=True)
class FeatureSpec:
    """Declarative feature plan for the KLSH stage (mirrors the reference's
    hard-coded column handling in ``klsh_engine.py:154-184``)."""

    numeric_cols: tuple[str, ...] = ()                    # z-score per component
    bool_cols: tuple[str, ...] = ()                       # quarter-circle
    ordinal_cols: tuple[tuple[str, int], ...] = ()        # (col, max)
    date_cols: tuple[tuple[str, str, int], ...] = ()      # (col, ref_date, horizon_days)
    weights: dict[str, float] = field(default_factory=dict)

    def output_columns(self) -> list[str]:
        out = []
        for c in self.bool_cols:
            out += [f"{c}_cos", f"{c}_sin"]
        out += list(self.numeric_cols)
        for c, _, _ in self.date_cols:
            out += [f"{c}_cos", f"{c}_sin"]
        for c, _ in self.ordinal_cols:
            out += [f"{c}_cos", f"{c}_sin"]
        return out

    def weight(self, name: str) -> float:
        return float(self.weights.get(name, 1.0))


def engineer(df: DataFrame, spec: FeatureSpec, component_col: str = "component_id") -> DataFrame:
    """Spark-side feature engineering producing the weighted numeric columns.

    Per-component scaler fit happens via window aggregation — semantically
    identical to the reference's per-slice ``StandardScaler().fit_transform``.
    """
    out = df
    for c in spec.bool_cols:
        cos, sin = embed_bool(F.col(c))
        out = out.withColumn(f"{c}_cos", cos * spec.weight(f"{c}_cos"))
        out = out.withColumn(f"{c}_sin", sin * spec.weight(f"{c}_sin"))
    for c in spec.numeric_cols:
        out = out.withColumn(
            c, zscore_per_group(F.col(c), component_col) * spec.weight(c)
        )
    for c, ref, horizon in spec.date_cols:
        cos, sin = embed_date(F.col(c), ref, horizon)
        out = out.withColumn(f"{c}_cos", cos * spec.weight(f"{c}_cos"))
        out = out.withColumn(f"{c}_sin", sin * spec.weight(f"{c}_sin"))
    for c, mx in spec.ordinal_cols:
        cos, sin = embed_ordinal(F.col(c), mx)
        out = out.withColumn(f"{c}_cos", cos * spec.weight(f"{c}_cos"))
        out = out.withColumn(f"{c}_sin", sin * spec.weight(f"{c}_sin"))
    return out
