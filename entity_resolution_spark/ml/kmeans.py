"""Deterministic numpy KMeans (k-means++ init, Lloyd iterations, multi-init).

The reference uses ``sklearn.cluster.KMeans(n_clusters=k, random_state=42)``
(``klsh_engine.py:197``); sklearn is not available in this environment, so
this is an independent implementation of the same public algorithm with the
same contract: seeded, deterministic, best-of-n_init by inertia.  It is only
ever invoked on per-component slices (tens of rows) inside ``applyInPandas``,
so a tight numpy loop is the right tool — the parallelism axis is the number
of components, handled by Spark.

Also hosts silhouette scoring and the elbow-knee pick (max distance to the
chord — the standard geometric Kneedle simplification) used for k selection
(reference E2/E3: ``klsh_engine.py:227-259``, ``perf_metrics.py:49-62``).
"""

from __future__ import annotations

import numpy as np


def _kmeans_pp_init(X: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    n = X.shape[0]
    centers = np.empty((k, X.shape[1]), dtype=np.float64)
    first = int(rng.integers(n))
    centers[0] = X[first]
    d2 = ((X - centers[0]) ** 2).sum(axis=1)
    for i in range(1, k):
        total = d2.sum()
        if total <= 0:
            centers[i] = X[int(rng.integers(n))]
        else:
            probs = d2 / total
            centers[i] = X[int(rng.choice(n, p=probs))]
        d2 = np.minimum(d2, ((X - centers[i]) ** 2).sum(axis=1))
    return centers


def kmeans_fit_predict(
    X: np.ndarray,
    k: int,
    seed: int = 42,
    n_init: int = 10,
    max_iter: int = 300,
    tol: float = 1e-4,
) -> tuple[np.ndarray, float]:
    """Labels + inertia; deterministic for a given (X, k, seed)."""
    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]
    k = min(k, n)
    rng = np.random.default_rng(seed)
    best_labels, best_inertia = None, np.inf
    for _ in range(n_init):
        centers = _kmeans_pp_init(X, k, rng)
        for _ in range(max_iter):
            d2 = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            labels = d2.argmin(axis=1)
            new_centers = centers.copy()
            for c in range(k):
                mask = labels == c
                if mask.any():
                    new_centers[c] = X[mask].mean(axis=0)
            shift = ((new_centers - centers) ** 2).sum()
            centers = new_centers
            if shift <= tol:
                break
        d2 = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        labels = d2.argmin(axis=1)
        inertia = d2[np.arange(n), labels].sum()
        if inertia < best_inertia - 1e-12:
            best_inertia, best_labels = inertia, labels
    # Relabel clusters by order of first appearance for stable output.
    remap, next_id = {}, 0
    out = np.empty_like(best_labels)
    for i, lb in enumerate(best_labels):
        if lb not in remap:
            remap[lb] = next_id
            next_id += 1
        out[i] = remap[lb]
    return out, float(best_inertia)


def silhouette(X: np.ndarray, labels: np.ndarray) -> float:
    """Mean silhouette coefficient (valid for 1 < k < n; else nan)."""
    X = np.asarray(X, dtype=np.float64)
    n = len(labels)
    k = len(np.unique(labels))
    if not (1 < k < n):
        return float("nan")
    D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2))
    s = np.zeros(n)
    for i in range(n):
        same = labels == labels[i]
        n_same = same.sum()
        a = D[i][same].sum() / (n_same - 1) if n_same > 1 else 0.0
        b = np.inf
        for c in np.unique(labels):
            if c == labels[i]:
                continue
            b = min(b, D[i][labels == c].mean())
        s[i] = 0.0 if n_same == 1 else (b - a) / max(a, b)
    return float(s.mean())


def elbow_knee(ks: list[int], wcss: list[float]) -> int | None:
    """Geometric knee: k maximizing distance to the chord from first to last
    point of the (k, wcss) curve (convex decreasing assumption, as the
    reference's KneeLocator usage)."""
    if len(ks) < 3:
        return None
    x = np.asarray(ks, dtype=np.float64)
    y = np.asarray(wcss, dtype=np.float64)
    # normalize to [0,1] so axes are comparable
    x = (x - x.min()) / (x.max() - x.min())
    rng_y = y.max() - y.min()
    if rng_y <= 0:
        return None
    y = (y - y.min()) / rng_y
    # distance from each point to the line joining endpoints
    p0, p1 = np.array([x[0], y[0]]), np.array([x[-1], y[-1]])
    d = np.abs(np.cross(p1 - p0, np.stack([x, y], axis=1) - p0)) / np.linalg.norm(p1 - p0)
    return int(ks[int(d.argmax())])
