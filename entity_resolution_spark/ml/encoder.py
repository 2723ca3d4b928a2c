"""Siamese-style tabular encoder re-expressed as a batched pandas-on-Arrow
inference UDF (F9) — numpy forward pass, broadcast weights.

Architecture mirrors the reference encoder's *shape*
(``siameselike_encoder/contrastive/encoders/tabular_numeric_encoder.py:9-123``):
four feature towers (quality, resonance, tension, longevity), each a 2-layer
MLP lifting its (cos, sin) / scalar inputs to a 64-d "high embedding";
concatenated (256) → 512 hidden → 128-d output embedding, L2-normalized
(``inference_engine.py:70``).  Torch is not available in this environment, so
the forward pass is numpy (GELU ≈ tanh approximation); weights are
deterministic He-init (seed 42, ``encoder_initialization.py:27-37`` semantics)
or loaded from an ``npz`` checkpoint (S5 analog).

Why this is the right Spark shape: weights are a few MB → broadcast once;
inference crosses into Python in Arrow record batches; embeddings come back
as ``array<float>`` columns.  Losses (M2-M4) live here too as pure-numpy
functions for the training path.
"""

from __future__ import annotations

import io
from dataclasses import dataclass

import numpy as np
import pandas as pd

EMBED_DIM = 128
TOWER_DIM = 64
HIDDEN_DIM = 512
# Reference ``config.py:106`` tne_encoder_quality_num_categories
N_QUALITY_CLASSES = 10

# tower name -> number of scalar inputs (cos/sin pairs except tension 1-d +
# adj pair; matches the reference's inputs_config grouping)
TOWERS: dict[str, int] = {
    "quality": 2,     # quality_cos, quality_sin
    "resonance": 1,   # scaled resonance
    "tension": 3,     # tension, tension_adj_cos, tension_adj_sin
    "longevity": 2,   # longevity_cos, longevity_sin
}
INPUT_COLS: list[str] = [
    "quality_cos", "quality_sin",
    "resonance",
    "tension", "tension_adj_cos", "tension_adj_sin",
    "longevity_cos", "longevity_sin",
]


def _he(rng: np.random.Generator, fan_in: int, fan_out: int) -> np.ndarray:
    return rng.normal(0.0, np.sqrt(2.0 / fan_in), size=(fan_in, fan_out))


def init_weights(seed: int = 42) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    w: dict[str, np.ndarray] = {}
    for name, d_in in TOWERS.items():
        w[f"{name}_w1"] = _he(rng, d_in, TOWER_DIM)
        w[f"{name}_b1"] = np.zeros(TOWER_DIM)
        w[f"{name}_w2"] = _he(rng, TOWER_DIM, TOWER_DIM)
        w[f"{name}_b2"] = np.zeros(TOWER_DIM)
    w["head_w1"] = _he(rng, TOWER_DIM * len(TOWERS), HIDDEN_DIM)
    w["head_b1"] = np.zeros(HIDDEN_DIM)
    w["head_w2"] = _he(rng, HIDDEN_DIM, EMBED_DIM)
    w["head_b2"] = np.zeros(EMBED_DIM)
    # M5 aux reconstruction heads (reference tabular_numeric_encoder.py:71-75):
    # linear taps off each tower's LOW-level activation reconstructing the
    # tower's raw inputs — quality class logits (CE), quality scalar (present
    # but excluded from the loss, as in the reference's wiring at
    # train_pair_contrast.py:268-303), resonance/tension scalars (MSE),
    # longevity (cos, sin) (MSE).  Drawn AFTER the main weights so existing
    # embedding determinism (seed 42) is unchanged.
    w["aux_quality_logits_w"] = _he(rng, TOWER_DIM, N_QUALITY_CLASSES)
    w["aux_quality_logits_b"] = np.zeros(N_QUALITY_CLASSES)
    w["aux_quality_scalar_w"] = _he(rng, TOWER_DIM, 1)
    w["aux_quality_scalar_b"] = np.zeros(1)
    w["aux_resonance_w"] = _he(rng, TOWER_DIM, 1)
    w["aux_resonance_b"] = np.zeros(1)
    w["aux_tension_w"] = _he(rng, TOWER_DIM, 1)
    w["aux_tension_b"] = np.zeros(1)
    w["aux_longevity_w"] = _he(rng, TOWER_DIM, 2)
    w["aux_longevity_b"] = np.zeros(2)
    return w


def reduced_init_weights(
    seed: int = 7, tower_dim: int = 4, hidden_dim: int = 8, embed_dim: int = 8
) -> dict[str, np.ndarray]:
    """A narrowed encoder (same tower topology, tiny widths, weights rounded
    to 4dp) whose forward pass is small enough to inline as SQL literals —
    the oracle-checkable F9 variant.  Rounding the weights keeps the SQL
    literals short; ``repr(float)`` round-trips them bit-exactly into the
    oracle, so both engines multiply the identical doubles."""
    rng = np.random.default_rng(seed)
    w: dict[str, np.ndarray] = {}
    for name, d_in in TOWERS.items():
        w[f"{name}_w1"] = _he(rng, d_in, tower_dim).round(4)
        w[f"{name}_b1"] = np.zeros(tower_dim)
        w[f"{name}_w2"] = _he(rng, tower_dim, tower_dim).round(4)
        w[f"{name}_b2"] = np.zeros(tower_dim)
    w["head_w1"] = _he(rng, tower_dim * len(TOWERS), hidden_dim).round(4)
    w["head_b1"] = np.zeros(hidden_dim)
    w["head_w2"] = _he(rng, hidden_dim, embed_dim).round(4)
    w["head_b2"] = np.zeros(embed_dim)
    return w


def _gelu(x: np.ndarray) -> np.ndarray:
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def _relu(x: np.ndarray) -> np.ndarray:
    return np.maximum(x, 0.0)


_ACTIVATIONS = {"gelu": _gelu, "relu": _relu}


def forward(
    weights: dict[str, np.ndarray],
    X: np.ndarray,
    activation: str = "gelu",
    dtype=np.float32,
) -> np.ndarray:
    """Batch forward: X [n, 8] (INPUT_COLS order) → L2-normalized embedding.

    Layer widths come from the weight shapes, so the same code runs the full
    (64/512/128) encoder and the reduced oracle-checkable one.  ``relu`` is
    exact arithmetic (no libm transcendental), which keeps the cross-engine
    float drift of the SQL replica at the 1-ulp-per-op level; pass
    ``dtype=np.float64`` for oracle comparison (float32's ~1e-7 noise
    straddles 4dp rounding boundaries too often at corpus scale).
    """
    act = _ACTIVATIONS[activation]
    outs = []
    offset = 0
    for name, d_in in TOWERS.items():
        xi = X[:, offset : offset + d_in]
        offset += d_in
        h = act(xi @ weights[f"{name}_w1"] + weights[f"{name}_b1"])
        h = act(h @ weights[f"{name}_w2"] + weights[f"{name}_b2"])
        outs.append(h)
    z = np.concatenate(outs, axis=1)
    h = act(z @ weights["head_w1"] + weights["head_b1"])
    e = h @ weights["head_w2"] + weights["head_b2"]
    norms = np.linalg.norm(e, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return (e / norms).astype(dtype)


# ---------------------------------------------------------------------------
# Checkpoint (S5 analog: save/load weights + metadata)
# ---------------------------------------------------------------------------

def save_weights(weights: dict[str, np.ndarray], path: str) -> None:
    np.savez(path, **weights)


def load_weights(path: str) -> dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def weights_to_bytes(weights: dict[str, np.ndarray]) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **weights)
    return buf.getvalue()


def weights_from_bytes(data: bytes) -> dict[str, np.ndarray]:
    with np.load(io.BytesIO(data)) as z:
        return {k: z[k] for k in z.files}


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

def embed_dataframe(
    df,
    weights: dict[str, np.ndarray],
    output_col: str = "embedding",
    activation: str = "gelu",
    output_dtype: str = "float32",
):
    """Add an ``array<float>`` embedding column; weights broadcast once.

    Input df must contain INPUT_COLS (see ``functions.features.engineer``).
    ``output_dtype="float64"`` yields ``array<double>`` (oracle-comparison
    precision); the default float32 matches the reference's inference dtype.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType, FloatType

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(weights_to_bytes(weights))
    np_dtype = np.float64 if output_dtype == "float64" else np.float32
    sql_type = ArrayType(DoubleType() if output_dtype == "float64" else FloatType())

    @pandas_udf(sql_type)
    def encode(*cols: pd.Series) -> pd.Series:
        w = weights_from_bytes(bc.value)
        X = np.column_stack([c.to_numpy(dtype=np.float64) for c in cols])
        E = forward(w, X, activation=activation, dtype=np_dtype)
        return pd.Series(list(E))

    return df.withColumn(output_col, encode(*[F.col(c) for c in INPUT_COLS]))


# ---------------------------------------------------------------------------
# Losses (M2-M4) — pure numpy, shared by the (driver-side) training loop
# ---------------------------------------------------------------------------

def contrastive_loss(d: np.ndarray, y: np.ndarray, margin: float = 2.0) -> float:
    """Hadsell contrastive: mean(0.5·((1-y)·d² + y·clamp(m-d,0)²))
    (``model_loss_classes.py:61-73``; y=1 means dissimilar pair there)."""
    return float(
        np.mean(0.5 * ((1 - y) * d**2 + y * np.clip(margin - d, 0, None) ** 2))
    )


def triplet_margin_loss(
    d_ap: np.ndarray, d_an: np.ndarray, margin: float = 2.0
) -> float:
    """mean(clamp(d_ap - d_an + margin, 0)) (``train_pair_contrast.py:93-94``)."""
    return float(np.mean(np.clip(d_ap - d_an + margin, 0, None)))


def tail_suppressed_triplet_loss(
    d_ap: np.ndarray,
    d_an: np.ndarray,
    margin: float = 2.0,
    ap_quantile: float = 0.01,
    an_quantile: float = 0.05,
) -> float:
    """M4 quantile mining: keep triplets with d_ap ≥ q(d_ap, .01) and
    d_an ≤ q(d_an, .95→an upper cut) (``model_loss_classes.py:16-59``)."""
    lo = np.quantile(d_ap, ap_quantile)
    hi = np.quantile(d_an, 1.0 - an_quantile)
    keep = (d_ap >= lo) & (d_an <= hi)
    if not keep.any():
        return 0.0
    return triplet_margin_loss(d_ap[keep], d_an[keep], margin)
