"""Feature-weight optimization (M11) — driver-side loop over the pipeline.

Reference: ``block_klsh/optimization/bayopt_weights.py:25-99`` runs skopt
``gp_minimize`` (seed 42, 100 calls) over 9 weights in [0,1] with objective
−mean(best F1 per component), then averages every weight vector scoring
within 1% of the optimum.  skopt is not in this environment; this is a
seeded random-search + local-refinement optimizer with the same contract:
deterministic, same objective shape, same top-1%-averaging post-processing.

The objective is a callable the caller builds from the Spark pipeline
(each evaluation = one KLSH sweep job); the optimizer itself never touches
Spark — exactly the reference's control structure (driver loop around the
engine).
"""

from __future__ import annotations

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
