"""Feature-weight optimization (M11) — driver-side loop over the pipeline.

Reference: ``block_klsh/optimization/bayopt_weights.py:25-99`` runs skopt
``gp_minimize`` (seed 42, 100 calls) over 9 weights in [0,1] with objective
−mean(best F1 per component), then averages every weight vector scoring
within 1% of the optimum.  skopt is not in this environment, so
``gp_minimize_np`` is a from-scratch numpy Gaussian-process optimizer with
the same dynamics (Matérn-5/2 surrogate, expected-improvement acquisition,
10 random initial points, seeded), and ``optimize_weights_gp`` wraps it with
the reference's outer contract: the frozen-longevity quirk
(``bayopt_weights.py:57-67`` — dims 4/5 are *sampled* by the optimizer but
replaced by fixed values before evaluation) and top-1%-of-best-score
averaging (``:36-51``, only when >1 vector qualifies).  ``optimize_weights``
(seeded random search + refinement) remains as the cheap fallback.

The objective is a callable the caller builds from the Spark pipeline
(each evaluation = one KLSH sweep job); the optimizer itself never touches
Spark — exactly the reference's control structure (driver loop around the
engine).
"""

from __future__ import annotations

import math

from collections.abc import Callable, Sequence

import numpy as np


def optimize_weights(
    objective: Callable[[Sequence[float]], float],
    n_weights: int = 9,
    n_calls: int = 100,
    seed: int = 42,
    early_stop_value: float | None = -1.0,
    refine_frac: float = 0.5,
    refine_sigma: float = 0.1,
) -> tuple[np.ndarray, float, list[tuple[np.ndarray, float]]]:
    """Minimize ``objective`` over [0,1]^n.

    Phase 1: uniform random sampling; phase 2 (last ``refine_frac`` of calls):
    Gaussian perturbations of the incumbent (clipped to [0,1]).  Returns
    (averaged best weights, best value, full history).  Averaging: all
    vectors with value ≤ best + 1%·|best| are averaged (reference
    ``bayopt_weights.py:36-51``).
    """
    rng = np.random.default_rng(seed)
    history: list[tuple[np.ndarray, float]] = []
    best_w, best_v = None, np.inf
    n_explore = max(1, int(n_calls * (1 - refine_frac)))
    for i in range(n_calls):
        if best_w is None or i < n_explore:
            w = rng.uniform(0, 1, size=n_weights)
        else:
            w = np.clip(best_w + rng.normal(0, refine_sigma, size=n_weights), 0, 1)
        v = float(objective(w))
        history.append((w, v))
        if v < best_v:
            best_v, best_w = v, w
        if early_stop_value is not None and v <= early_stop_value:
            break
    tol = abs(best_v) * 0.01
    near = [w for w, v in history if v <= best_v + tol]
    avg = np.mean(near, axis=0) if near else best_w
    return avg, best_v, history


# ---------------------------------------------------------------------------
# GP surrogate (gp_minimize parity, pure numpy)
# ---------------------------------------------------------------------------

def _matern52(X1: np.ndarray, X2: np.ndarray, ls: float) -> np.ndarray:
    d2 = ((X1[:, None, :] - X2[None, :, :]) ** 2).sum(-1)
    r = np.sqrt(np.maximum(d2, 0.0)) / ls
    s = math.sqrt(5.0) * r
    return (1.0 + s + (5.0 / 3.0) * r**2) * np.exp(-s)


_SQRT2 = math.sqrt(2.0)
_erf = np.vectorize(math.erf)


def gp_minimize_np(
    objective: Callable[[np.ndarray], float],
    n_dims: int,
    n_calls: int = 100,
    seed: int = 42,
    n_initial: int = 10,
    early_stop_value: float | None = None,
    pool: int = 512,
) -> tuple[np.ndarray, float, list[tuple[np.ndarray, float]]]:
    """Sequential model-based minimization over [0,1]^n (gp_minimize shape):
    ``n_initial`` seeded-random points, then a Matérn-5/2 GP fit to all
    observations picks each next point by expected improvement over a random
    candidate pool (uniform + perturbations of the incumbent).

    Pure numpy: O(t³) Cholesky per step on the t×t kernel matrix — trivial at
    the reference's 100-call budget, and the objective (a Spark KLSH sweep)
    dominates wall-clock anyway.
    """
    rng = np.random.default_rng(seed)
    X: list[np.ndarray] = []
    y: list[float] = []
    history: list[tuple[np.ndarray, float]] = []
    best_x, best_v = None, np.inf
    for i in range(n_calls):
        if i < n_initial or best_x is None:
            x = rng.uniform(0, 1, size=n_dims)
        else:
            Xa, ya = np.array(X), np.array(y)
            std = ya.std()
            yn = (ya - ya.mean()) / (std if std > 0 else 1.0)
            # median-heuristic length scale over observed points
            d2 = ((Xa[:, None, :] - Xa[None, :, :]) ** 2).sum(-1)
            med = np.median(np.sqrt(d2[np.triu_indices(len(Xa), 1)]))
            ls = float(med) if med > 0 else math.sqrt(n_dims) / 2
            K = _matern52(Xa, Xa, ls) + 1e-6 * np.eye(len(Xa))
            L = np.linalg.cholesky(K)
            alpha = np.linalg.solve(L.T, np.linalg.solve(L, yn))
            cand = np.vstack(
                [
                    rng.uniform(0, 1, size=(pool // 2, n_dims)),
                    np.clip(
                        best_x + rng.normal(0, 0.1, size=(pool // 2, n_dims)),
                        0, 1,
                    ),
                ]
            )
            Ks = _matern52(cand, Xa, ls)
            mu = Ks @ alpha
            v = np.linalg.solve(L, Ks.T)
            var = np.clip(1.0 - (v**2).sum(axis=0), 1e-12, None)
            sigma = np.sqrt(var)
            imp = yn.min() - mu
            z = imp / sigma
            cdf = 0.5 * (1.0 + _erf(z / _SQRT2))
            pdf = np.exp(-0.5 * z**2) / math.sqrt(2 * math.pi)
            ei = imp * cdf + sigma * pdf
            x = cand[int(np.argmax(ei))]
        val = float(objective(x))
        X.append(x)
        y.append(val)
        history.append((x, val))
        if val < best_v:
            best_v, best_x = val, x
        if early_stop_value is not None and val <= early_stop_value:
            break
    return best_x, best_v, history


def optimize_weights_gp(
    objective: Callable[[Sequence[float]], float],
    n_weights: int = 9,
    n_calls: int = 100,
    seed: int = 42,
    early_stop_value: float | None = -1.0,
    frozen: dict[int, float] | None = None,
    n_initial: int = 10,
) -> tuple[np.ndarray, float, list[tuple[np.ndarray, float]]]:
    """Reference ``bayopt_weights.py:25-51`` outer contract around the GP.

    * ``frozen`` reproduces the frozen-longevity quirk (``:57-67``): those
      dims are part of the search space and the recorded vectors, but the
      objective always sees the frozen values.
    * Averaging (``:36-51``): all sampled vectors whose *score* (−value) is
      ≥ 99% of the best score are averaged — only if more than one
      qualifies, else the raw best point is returned (the reference's exact
      branch).
    """

    def wrapped(x: np.ndarray) -> float:
        if frozen:
            x = x.copy()
            for i, v in frozen.items():
                x[i] = v
        return objective(x)

    best_x, best_v, history = gp_minimize_np(
        wrapped, n_weights, n_calls=n_calls, seed=seed,
        n_initial=n_initial, early_stop_value=early_stop_value,
    )
    best_score = -best_v
    top = [x for x, v in history if -v >= 0.99 * best_score]
    if len(top) > 1:
        avg = np.mean(top, axis=0)
    else:
        avg = best_x
    return avg, best_v, history
