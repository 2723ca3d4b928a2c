"""Encoder training (numpy backprop), ward clustering, weight optimization."""

from __future__ import annotations

import numpy as np

from entity_resolution_spark.ml import encoder as E
from entity_resolution_spark.ml.hierarchical import ward_labels
from entity_resolution_spark.ml.optimize import optimize_weights
from entity_resolution_spark.ml.train import _forward_cached, train_triplets


def _triplet_data(n=96, seed=0):
    """Two latent 'models': anchors/positives from one, negatives from the other."""
    rng = np.random.default_rng(seed)

    def sample(center, k):
        base = np.zeros((k, 8))
        base[:, :] = center
        return base + rng.normal(0, 0.05, size=(k, 8))

    c1 = np.array([0.9, 0.1, 0.2, 0.3, 1.0, 0.0, 0.5, 0.8])
    c2 = np.array([0.1, 0.9, 0.8, -0.3, 0.0, 1.0, 0.9, 0.2])
    return sample(c1, n), sample(c1, n), sample(c2, n)


def test_gradient_check():
    """Finite-difference check of the hand-derived backprop."""
    rng = np.random.default_rng(3)
    w = E.init_weights(seed=1)
    X1, X2 = rng.normal(size=(4, 8)), rng.normal(size=(4, 8))
    y = np.array([0.0, 1.0, 0.0, 1.0])
    margin = 2.0

    def loss_fn(wd):
        from entity_resolution_spark.ml.train import _forward_cached

        e1, _ = _forward_cached(wd, X1)
        e2, _ = _forward_cached(wd, X2)
        d = np.linalg.norm(e1 - e2, axis=1)
        clamp = np.maximum(margin - d, 0)
        return float(np.mean(0.5 * ((1 - y) * d**2 + y * clamp**2)))

    # analytic grads
    from entity_resolution_spark.ml.train import _backward

    e1, c1 = _forward_cached(w, X1)
    e2, c2 = _forward_cached(w, X2)
    diff = e1 - e2
    d = np.linalg.norm(diff, axis=1)
    clamp = np.maximum(margin - d, 0)
    dL_dd = ((1 - y) * d - y * clamp) / len(y)
    grad_e1 = (dL_dd / np.where(d == 0, 1, d))[:, None] * diff
    grads = {k: np.zeros_like(v) for k, v in w.items()}
    _backward(w, c1, grad_e1, grads)
    _backward(w, c2, -grad_e1, grads)

    for key in ["head_w2", "quality_w1", "head_b1"]:
        g = grads[key]
        idx = (0,) if g.ndim == 1 else (0, 0)
        h = 1e-5
        wp = {k: v.copy() for k, v in w.items()}
        wp[key][idx] += h
        wm = {k: v.copy() for k, v in w.items()}
        wm[key][idx] -= h
        num = (loss_fn(wp) - loss_fn(wm)) / (2 * h)
        assert abs(num - g[idx]) < 1e-4, f"{key}: {num} vs {g[idx]}"


def test_training_separates_models():
    Xa, Xp, Xn = _triplet_data()
    res = train_triplets(Xa, Xp, Xn, epochs=60, lr=3e-3, seed=42)
    e_a, _ = _forward_cached(res.weights, Xa)
    e_p, _ = _forward_cached(res.weights, Xp)
    e_n, _ = _forward_cached(res.weights, Xn)
    d_ap = np.linalg.norm(e_a - e_p, axis=1).mean()
    d_an = np.linalg.norm(e_a - e_n, axis=1).mean()
    assert d_ap < 0.5, d_ap
    assert d_an > 1.5, d_an          # pushed toward the margin (2.0)
    # E5: threshold accuracy at sim = clamp(1 - d/2, 0, 1) >= 0.7
    sim_ap = np.clip(1 - np.linalg.norm(e_a - e_p, axis=1) / 2, 0, 1)
    sim_an = np.clip(1 - np.linalg.norm(e_a - e_n, axis=1) / 2, 0, 1)
    assert (sim_ap >= 0.7).mean() > 0.95
    assert (sim_an < 0.7).mean() > 0.95
    # loss decreased and training is deterministic
    assert res.history[-1] < res.history[0]
    res2 = train_triplets(Xa, Xp, Xn, epochs=60, lr=3e-3, seed=42)
    assert res.best_loss == res2.best_loss


def _aux_triplet_data(n=96, seed=0):
    """Triplet data with *valid* feature semantics for the recon heads:
    cols 0-1 a true quarter-circle (cos, sin) of an integer quality class,
    col 2 resonance, col 3 tension, cols 6-7 a unit (cos, sin)."""
    rng = np.random.default_rng(seed)

    def sample(qcls, res, ten, ang, k):
        X = np.zeros((k, 8))
        theta = qcls / (E.N_QUALITY_CLASSES - 1) * np.pi / 2
        X[:, 0], X[:, 1] = np.cos(theta), np.sin(theta)
        X[:, 2] = res + rng.normal(0, 0.02, k)
        X[:, 3] = ten + rng.normal(0, 0.02, k)
        X[:, 4], X[:, 5] = 1.0, 0.0
        X[:, 6], X[:, 7] = np.cos(ang), np.sin(ang)
        return X

    return (
        sample(2, 0.3, 0.4, 0.5, n),
        sample(2, 0.3, 0.4, 0.5, n),
        sample(8, 0.9, -0.2, 1.2, n),
    )


def test_aux_recon_gradient_check():
    """Finite-difference check of the M5 recon-head backprop (CE + MSE) and
    its flow into the tower weights."""
    from entity_resolution_spark.ml.train import (
        _aux_loss_and_grads, _backward, _forward_cached)

    rng = np.random.default_rng(7)
    w = E.init_weights(seed=1)
    X = rng.normal(size=(5, 8))

    def loss_fn(wd):
        _, c = _forward_cached(wd, X)
        g = {k: np.zeros_like(v) for k, v in wd.items()}
        a, _ = _aux_loss_and_grads(wd, X, c, g, 1.0)
        return a

    _, c = _forward_cached(w, X)
    grads = {k: np.zeros_like(v) for k, v in w.items()}
    _, extra = _aux_loss_and_grads(w, X, c, grads, 1.0)
    # tower weights receive the aux grads only through extra_h1 → _backward
    _backward(w, c, np.zeros((5, E.EMBED_DIM)), grads, extra)

    for key in ["aux_quality_logits_w", "aux_longevity_w", "aux_tension_b",
                "quality_w1", "longevity_w1"]:
        g = grads[key]
        idx = (0,) if g.ndim == 1 else (0, 0)
        h = 1e-6
        wp = {k: v.copy() for k, v in w.items()}
        wp[key][idx] += h
        wm = {k: v.copy() for k, v in w.items()}
        wm[key][idx] -= h
        num = (loss_fn(wp) - loss_fn(wm)) / (2 * h)
        assert abs(num - g[idx]) < 1e-4, f"{key}: {num} vs {g[idx]}"


def test_aux_recon_losses_decrease_and_separation_holds():
    """M5 'Done' criterion: recon losses decrease during training AND the
    embedding separation gate still holds with the aux heads active."""
    from entity_resolution_spark.ml.train import REFERENCE_DECAY

    Xa, Xp, Xn = _aux_triplet_data()
    res = train_triplets(Xa, Xp, Xn, epochs=60, lr=3e-3, seed=42,
                         aux_weight=1.0, weight_decay=REFERENCE_DECAY)
    assert res.aux_history[-1] < 0.5 * res.aux_history[0], res.aux_history[:3]
    e_a, _ = _forward_cached(res.weights, Xa)
    e_p, _ = _forward_cached(res.weights, Xp)
    e_n, _ = _forward_cached(res.weights, Xn)
    assert np.linalg.norm(e_a - e_p, axis=1).mean() < 0.5
    assert np.linalg.norm(e_a - e_n, axis=1).mean() > 1.5


def test_adamw_per_layer_decay_applied():
    """M6: with zero gradients (identical similar pairs → d=0 → no grad) the
    AdamW update reduces each weight by exactly lr·decay(key)·w per step, so
    per-group decay rates are observable in the weight ratios."""
    from entity_resolution_spark.ml.train import decay_for, train_contrastive

    X = np.zeros((8, 8))
    y = np.zeros(8)
    table = {"tension": 0.5, "head": 0.1, "quality": 0.0, "resonance": 0.0,
             "longevity": 0.0, "aux_": 0.0}
    w0 = E.init_weights(seed=3)
    res = train_contrastive(X, X, y, weights=w0, epochs=1, batch_size=8,
                            lr=0.1, weight_decay=table)
    steps = 1  # one batch, one epoch
    for key, expect_wd in (("tension_w1", 0.5), ("head_w2", 0.1),
                           ("quality_w1", 0.0), ("aux_tension_w", 0.0)):
        assert decay_for(key, table) == expect_wd
        ratio = (1 - 0.1 * expect_wd) ** steps
        got = res.weights[key]
        assert np.allclose(got, w0[key] * ratio, rtol=1e-12), key


def test_trained_embeddings_ward_cluster_two_models():
    """Mirrors the reference's 10-record test: 2 piano models → 2 clusters."""
    Xa, Xp, Xn = _triplet_data()
    res = train_triplets(Xa, Xp, Xn, epochs=60, lr=3e-3, seed=42)
    test_X = np.concatenate([Xa[:5], Xn[:5]])
    emb, _ = _forward_cached(res.weights, test_X)
    labels = ward_labels(emb, distance_threshold=0.2)
    assert len(set(labels)) == 2
    assert len(set(labels[:5])) == 1 and len(set(labels[5:])) == 1


def test_ward_basic():
    X = np.vstack([np.zeros((4, 3)), np.ones((4, 3))])
    labels = ward_labels(X, distance_threshold=0.5)
    assert len(set(labels)) == 2


def test_optimize_weights_deterministic_and_improves():
    target = np.array([0.3, 0.7, 0.5])

    def obj(w):
        return float(((np.asarray(w) - target) ** 2).sum())

    w1, v1, hist = optimize_weights(obj, n_weights=3, n_calls=60, early_stop_value=None)
    w2, v2, _ = optimize_weights(obj, n_weights=3, n_calls=60, early_stop_value=None)
    assert np.allclose(w1, w2) and v1 == v2
    assert v1 < obj([0.5, 0.5, 0.5])
    assert v1 < hist[0][1] or v1 <= min(h[1] for h in hist)


def test_gp_optimizer_beats_random_search_equal_budget():
    """M11 'Done' criterion: the GP surrogate improves the mean best value
    over pure random search at an equal call budget (5 seeds)."""
    from entity_resolution_spark.ml.optimize import optimize_weights_gp

    target = np.array([0.23, 0.71, 0.52, 0.11, 0.88])

    def obj(w):
        return float(((np.asarray(w) - target) ** 2).sum())

    budget = 30
    gp_best, rs_best = [], []
    for seed in range(5):
        _, v_gp, _ = optimize_weights_gp(
            obj, n_weights=5, n_calls=budget, seed=seed, early_stop_value=None
        )
        _, v_rs, _ = optimize_weights(
            obj, n_weights=5, n_calls=budget, seed=seed,
            early_stop_value=None, refine_frac=0.0,
        )
        gp_best.append(v_gp)
        rs_best.append(v_rs)
    assert np.mean(gp_best) < np.mean(rs_best), (gp_best, rs_best)


def test_gp_optimizer_frozen_longevity_quirk_and_determinism():
    """The frozen dims are sampled in the recorded vectors but the objective
    always receives the frozen values (reference bayopt_weights.py:57-67);
    same seed → identical run."""
    from entity_resolution_spark.ml.optimize import optimize_weights_gp

    seen = []

    def obj(w):
        seen.append(np.asarray(w).copy())
        return float((np.asarray(w) ** 2).sum())

    frozen = {4: 0.25, 5: 0.75}
    w1, v1, hist = optimize_weights_gp(
        obj, n_weights=9, n_calls=12, seed=42,
        early_stop_value=None, frozen=frozen, n_initial=5,
    )
    assert all(x[4] == 0.25 and x[5] == 0.75 for x in seen)
    # the *sampled* history still explores those dims (reference averages
    # x_iters, which contain the sampled — not frozen — values)
    assert np.std([x[4] for x, _ in hist]) > 0
    seen2 = []

    def obj2(w):
        seen2.append(1)
        return float((np.asarray(w) ** 2).sum())

    w2, v2, _ = optimize_weights_gp(
        obj2, n_weights=9, n_calls=12, seed=42,
        early_stop_value=None, frozen=frozen, n_initial=5,
    )
    assert v1 == v2 and np.allclose(w1, w2)


def test_optimize_weights_early_stop():
    calls = []

    def obj(w):
        calls.append(1)
        return -2.0  # immediately below early_stop_value=-1

    optimize_weights(obj, n_weights=2, n_calls=50, early_stop_value=-1.0)
    assert len(calls) == 1


def test_cyclic_lr_schedule():
    from entity_resolution_spark.ml.train import cyclic_lr_with_restarts

    lr = cyclic_lr_with_restarts(1.0, cycle_len=4, t_mult=2.0, min_frac=0.0)
    assert lr(0) == 1.0          # cycle start = base lr
    assert lr(3) < 0.1           # cycle end ~ min
    assert lr(4) == 1.0          # restart
    assert lr(11) < 0.1 and lr(12) == 1.0  # second cycle is 8 long
    # training with the schedule still converges
    Xa, Xp, Xn = _triplet_data(n=48)
    res = train_triplets(Xa, Xp, Xn, epochs=30, lr=3e-3,
                         lr_schedule=cyclic_lr_with_restarts(3e-3, cycle_len=10))
    assert res.history[-1] < res.history[0]
