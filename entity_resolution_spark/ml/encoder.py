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


def _gelu(x: np.ndarray) -> np.ndarray:
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def forward(weights: dict[str, np.ndarray], X: np.ndarray) -> np.ndarray:
    """Batch forward: X [n, 8] (INPUT_COLS order) → L2-normalized [n, 128]."""
    outs = []
    offset = 0
    for name, d_in in TOWERS.items():
        xi = X[:, offset : offset + d_in]
        offset += d_in
        h = _gelu(xi @ weights[f"{name}_w1"] + weights[f"{name}_b1"])
        h = _gelu(h @ weights[f"{name}_w2"] + weights[f"{name}_b2"])
        outs.append(h)
    z = np.concatenate(outs, axis=1)
    h = _gelu(z @ weights["head_w1"] + weights["head_b1"])
    e = h @ weights["head_w2"] + weights["head_b2"]
    norms = np.linalg.norm(e, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return (e / norms).astype(np.float32)


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

def embed_dataframe(df, weights: dict[str, np.ndarray], output_col: str = "embedding"):
    """Add an ``array<float>`` embedding column; weights broadcast once.

    Input df must contain INPUT_COLS (see ``functions.features.engineer``).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, FloatType

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(weights_to_bytes(weights))

    @pandas_udf(ArrayType(FloatType()))
    def encode(*cols: pd.Series) -> pd.Series:
        w = weights_from_bytes(bc.value)
        X = np.column_stack([c.to_numpy(dtype=np.float64) for c in cols])
        E = forward(w, X)
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
