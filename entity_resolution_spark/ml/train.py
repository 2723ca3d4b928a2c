"""Encoder training loop (M1/M2/M6-M9) — numpy backprop, driver-side.

The reference trains its siamese encoder with torch on one GPU
(``training/train_pair_contrast.py:86-702``); torch is not in this container,
so this is a from-scratch numpy implementation of the same training contract
for the architecture in ``encoder.py``: contrastive pair loss (M2) or triplet
margin loss (M3), Adam (the reference uses AdamW, M6), epoch loop with eval
every ``eval_every`` epochs, checkpoint-on-min-loss and early break (M9).

Spark's role (as in the target design) is feature prep and labeled-pair
sampling; training itself is a driver-side loop over numpy batches — the
dataset sizes (10⁴-10⁵ triplets) don't warrant distribution.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import encoder as E

_K = np.sqrt(2.0 / np.pi)


def _gelu_fwd(x):
    inner = _K * (x + 0.044715 * x**3)
    t = np.tanh(inner)
    return 0.5 * x * (1.0 + t), (x, t)


def _gelu_bwd(grad, cache):
    x, t = cache
    dinner = _K * (1.0 + 3 * 0.044715 * x**2)
    return grad * (0.5 * (1.0 + t) + 0.5 * x * (1.0 - t**2) * dinner)


def _forward_cached(w, X):
    """Forward pass keeping every activation for backprop."""
    cache = {"tower": {}}
    outs = []
    off = 0
    for name, d_in in E.TOWERS.items():
        xi = X[:, off : off + d_in]
        off += d_in
        z1 = xi @ w[f"{name}_w1"] + w[f"{name}_b1"]
        h1, g1 = _gelu_fwd(z1)
        z2 = h1 @ w[f"{name}_w2"] + w[f"{name}_b2"]
        h2, g2 = _gelu_fwd(z2)
        cache["tower"][name] = (xi, g1, h1, g2)
        outs.append(h2)
    z = np.concatenate(outs, axis=1)
    zh = z @ w["head_w1"] + w["head_b1"]
    h, gh = _gelu_fwd(zh)
    u = h @ w["head_w2"] + w["head_b2"]
    norm = np.linalg.norm(u, axis=1, keepdims=True)
    norm = np.where(norm == 0, 1.0, norm)
    e = u / norm
    cache.update(z=z, gh=gh, h=h, u=u, norm=norm, e=e)
    return e, cache


def _backward(w, cache, grad_e, grads, extra_h1=None):
    """Accumulate parameter grads for one forward pass given dL/de.

    ``extra_h1`` maps tower name → additional dL/dh1 (the aux recon heads tap
    each tower's low-level activation, reference tabular_numeric_encoder.py
    forward()), merged into the tower backprop."""
    u, norm, e = cache["u"], cache["norm"], cache["e"]
    # e = u/||u||  →  grad_u = (grad_e - (grad_e·e)e)/||u||
    grad_u = (grad_e - (grad_e * e).sum(axis=1, keepdims=True) * e) / norm
    grads["head_w2"] += cache["h"].T @ grad_u
    grads["head_b2"] += grad_u.sum(axis=0)
    grad_h = grad_u @ w["head_w2"].T
    grad_zh = _gelu_bwd(grad_h, cache["gh"])
    grads["head_w1"] += cache["z"].T @ grad_zh
    grads["head_b1"] += grad_zh.sum(axis=0)
    grad_z = grad_zh @ w["head_w1"].T
    off = 0
    for name, _d_in in E.TOWERS.items():
        gslice = grad_z[:, off : off + E.TOWER_DIM]
        off += E.TOWER_DIM
        xi, g1, h1, g2 = cache["tower"][name]
        grad_z2 = _gelu_bwd(gslice, g2)
        grads[f"{name}_w2"] += h1.T @ grad_z2
        grads[f"{name}_b2"] += grad_z2.sum(axis=0)
        grad_h1 = grad_z2 @ w[f"{name}_w2"].T
        if extra_h1 is not None and name in extra_h1:
            grad_h1 = grad_h1 + extra_h1[name]
        grad_z1 = _gelu_bwd(grad_h1, g1)
        grads[f"{name}_w1"] += xi.T @ grad_z1
        grads[f"{name}_b1"] += grad_z1.sum(axis=0)


# ---------------------------------------------------------------------------
# M5 aux reconstruction loss (reference train_pair_contrast.py:268-303)
# ---------------------------------------------------------------------------

def quality_class_of(X: np.ndarray) -> np.ndarray:
    """Recover the integer quality category from its quarter-circle
    (cos, sin) embedding: class = angle/(π/2)·(C−1) — the inverse of
    ``features.embed_ordinal``."""
    ang = np.arctan2(X[:, 1], X[:, 0])
    cls = np.rint(ang / (np.pi / 2) * (E.N_QUALITY_CLASSES - 1))
    return np.clip(cls, 0, E.N_QUALITY_CLASSES - 1).astype(int)


def _aux_loss_and_grads(w, X, cache, grads, weight):
    """Forward + backward through the 5 recon heads for one element.

    Returns (aux_loss, extra_h1_grads).  Loss terms follow the reference
    exactly: cross-entropy on quality class logits; MSE on resonance scalar,
    tension scalar, and longevity cos/sin as two separate means (all torch
    ``mean`` reductions); the quality *scalar* head exists but — like the
    reference's wiring — contributes nothing to the loss.
    """
    n = len(X)
    extra: dict[str, np.ndarray] = {}
    loss = 0.0

    h1_q = cache["tower"]["quality"][2]
    logits = h1_q @ w["aux_quality_logits_w"] + w["aux_quality_logits_b"]
    target = quality_class_of(X)
    lmax = logits.max(axis=1, keepdims=True)
    ex = np.exp(logits - lmax)
    p = ex / ex.sum(axis=1, keepdims=True)
    loss += float(-np.mean(np.log(p[np.arange(n), target] + 1e-12)))
    dlogits = p.copy()
    dlogits[np.arange(n), target] -= 1.0
    dlogits *= weight / n
    grads["aux_quality_logits_w"] += h1_q.T @ dlogits
    grads["aux_quality_logits_b"] += dlogits.sum(axis=0)
    extra["quality"] = dlogits @ w["aux_quality_logits_w"].T

    for name, wkey, target_cols in (
        ("resonance", "aux_resonance", X[:, 2:3]),
        ("tension", "aux_tension", X[:, 3:4]),
        ("longevity", "aux_longevity", X[:, 6:8]),
    ):
        h1 = cache["tower"][name][2]
        pred = h1 @ w[f"{wkey}_w"] + w[f"{wkey}_b"]
        diff = pred - target_cols
        # reference: one mean-MSE per output column, summed
        loss += float((diff**2).mean(axis=0).sum())
        dpred = (2.0 / n) * diff * weight
        grads[f"{wkey}_w"] += h1.T @ dpred
        grads[f"{wkey}_b"] += dpred.sum(axis=0)
        extra[name] = dpred @ w[f"{wkey}_w"].T

    return loss, extra


# ---------------------------------------------------------------------------
# M6 AdamW per-layer weight-decay groups
# (reference encoder_initialization.py:39-118 + config.py:132-147)
# ---------------------------------------------------------------------------

# Longest-prefix decay table; values are the reference's per-group AdamW
# weight_decay.  tension-related layers decay at 5e-6, the combined head at
# 1e-4, everything else at 1e-5.
REFERENCE_DECAY: dict[str, float] = {
    "quality": 1e-5,
    "resonance": 1e-5,
    "tension": 5e-6,
    "longevity": 1e-5,
    "head": 1e-4,
    "aux_quality": 1e-5,
    "aux_resonance": 1e-5,
    "aux_tension": 5e-6,
    "aux_longevity": 1e-5,
}


def decay_for(key: str, table: dict[str, float]) -> float:
    best, best_len = 0.0, -1
    for prefix, wd in table.items():
        if key.startswith(prefix) and len(prefix) > best_len:
            best, best_len = wd, len(prefix)
    return best


def cyclic_lr_with_restarts(
    base_lr: float,
    cycle_len: int = 10,
    t_mult: float = 2.0,
    min_frac: float = 0.01,
):
    """M7: cosine-annealing LR with warm restarts (public SGDR schedule,
    Loshchilov & Hutter arXiv:1608.03983 — the reference vendors an
    implementation of the same family at ``schedulers/cyclic_scheduler.py``).

    Returns ``lr(epoch) -> float``: cosine decay from base_lr to
    min_frac·base_lr within each cycle; cycle length multiplies by ``t_mult``
    at each restart.
    """

    def lr(epoch: int) -> float:
        start, length = 0, cycle_len
        while epoch >= start + length:
            start += length
            length = int(length * t_mult)
        frac = (epoch - start) / max(length - 1, 1)
        lo = base_lr * min_frac
        return lo + 0.5 * (base_lr - lo) * (1 + np.cos(np.pi * frac))

    return lr


@dataclass
class TrainResult:
    weights: dict[str, np.ndarray]
    best_loss: float  # best OPTIMIZED objective: contrastive + aux_weight·aux
    history: list[float] = field(default_factory=list)  # contrastive only
    epochs_run: int = 0
    aux_history: list[float] = field(default_factory=list)  # raw (unweighted) aux


def train_contrastive(
    X1: np.ndarray,
    X2: np.ndarray,
    y: np.ndarray,
    weights: dict[str, np.ndarray] | None = None,
    epochs: int = 100,
    batch_size: int = 128,
    lr: float = 1e-3,
    margin: float = 2.0,
    seed: int = 42,
    early_stop_loss: float = 1e-6,
    lr_schedule=None,
    aux_weight: float = 0.0,
    weight_decay: dict[str, float] | float | None = None,
) -> TrainResult:
    """Pairwise contrastive training: y=0 similar (pull), y=1 dissimilar (push).

    Adam, shuffled batches (seeded), checkpoint-on-min-loss, early break —
    the reference loop's contract (``train_pair_contrast.py:533-562,651-652``).

    ``aux_weight > 0`` enables the M5 reconstruction heads (reference:
    ``loss = batch_triplet_loss + batch_aux_loss``, i.e. weight 1.0), applied
    to both elements of each pair.  ``weight_decay`` enables AdamW decoupled
    decay (M6): pass ``REFERENCE_DECAY`` for the reference's per-layer groups,
    a float for a flat decay, or None for plain Adam.
    """
    rng = np.random.default_rng(seed)
    w = {k: v.copy() for k, v in (weights or E.init_weights(seed)).items()}
    if isinstance(weight_decay, dict):
        wd = {k: decay_for(k, weight_decay) for k in w}
    else:
        wd = {k: float(weight_decay or 0.0) for k in w}
    m_t = {k: np.zeros_like(v) for k, v in w.items()}
    v_t = {k: np.zeros_like(v) for k, v in w.items()}
    b1, b2, eps = 0.9, 0.999, 1e-8
    step = 0
    best_loss, best_w = np.inf, None
    history, aux_history = [], []
    n = len(X1)
    epochs_run = 0
    for epoch in range(epochs):
        ep_lr = lr_schedule(epoch) if lr_schedule else lr
        idx = rng.permutation(n)
        ep_loss = 0.0
        ep_aux = 0.0
        for s in range(0, n, batch_size):
            b = idx[s : s + batch_size]
            e1, c1 = _forward_cached(w, X1[b])
            e2, c2 = _forward_cached(w, X2[b])
            diff = e1 - e2
            d = np.linalg.norm(diff, axis=1)
            yb = y[b]
            clamp = np.maximum(margin - d, 0.0)
            loss = float(np.mean(0.5 * ((1 - yb) * d**2 + yb * clamp**2)))
            ep_loss += loss * len(b)
            # dL/dd per sample, then chain to embeddings
            dL_dd = ((1 - yb) * d - yb * clamp) / len(b)
            safe_d = np.where(d == 0, 1.0, d)
            grad_e1 = (dL_dd / safe_d)[:, None] * diff
            grads = {k: np.zeros_like(v) for k, v in w.items()}
            extra1 = extra2 = None
            if aux_weight > 0:
                a1, extra1 = _aux_loss_and_grads(w, X1[b], c1, grads, aux_weight)
                a2, extra2 = _aux_loss_and_grads(w, X2[b], c2, grads, aux_weight)
                ep_aux += (a1 + a2) * len(b)
            _backward(w, c1, grad_e1, grads, extra1)
            _backward(w, c2, -grad_e1, grads, extra2)
            step += 1
            for k in w:
                m_t[k] = b1 * m_t[k] + (1 - b1) * grads[k]
                v_t[k] = b2 * v_t[k] + (1 - b2) * grads[k] ** 2
                mh = m_t[k] / (1 - b1**step)
                vh = v_t[k] / (1 - b2**step)
                # AdamW decoupled decay (M6): the decay term is applied to the
                # weight directly, scaled by lr — not mixed into the gradient
                w[k] -= ep_lr * (mh / (np.sqrt(vh) + eps) + wd[k] * w[k])
        ep_loss /= n
        ep_aux /= n
        history.append(ep_loss)
        aux_history.append(ep_aux)
        epochs_run = epoch + 1
        # checkpoint/early-break on the OPTIMIZED objective: contrastive +
        # weighted aux (the reference's `loss = batch_triplet_loss +
        # batch_aux_loss`); with aux off this is the plain contrastive loss
        ep_total = ep_loss + aux_weight * ep_aux
        if ep_total < best_loss:
            best_loss = ep_total
            best_w = {k: v.copy() for k, v in w.items()}
        if ep_total < early_stop_loss:
            break
    return TrainResult(weights=best_w or w, best_loss=best_loss,
                       history=history, epochs_run=epochs_run,
                       aux_history=aux_history)


def train_triplets(
    Xa: np.ndarray,
    Xp: np.ndarray,
    Xn: np.ndarray,
    **kw,
) -> TrainResult:
    """Triplet training via the contrastive loop: (a,p,y=0) + (a,n,y=1)."""
    X1 = np.concatenate([Xa, Xa])
    X2 = np.concatenate([Xp, Xn])
    y = np.concatenate([np.zeros(len(Xa)), np.ones(len(Xa))])
    return train_contrastive(X1, X2, y, **kw)
