"""Non-negative Least Angle Regression (LARS) with the Lasso modification.

Solves ``argmin_beta 0.5 * ||y - X beta||^2  subject to beta >= 0`` by the
active-set LARS procedure (Efron et al. 2004; non-negative variant after
the DTU imm5523 MATLAB solver, which is also the lineage of the reference
implementation at ``/root/reference/hisel/lar/lar.py:7-104``).

The Spark-critical property: the iteration touches the design matrix X
only through the Gram ``G = X^T X`` (d x d) and the correlation vector
``r = X^T y`` (d,).  :func:`solve_gram` therefore runs entirely on the
driver from sufficient statistics that executors produced and Spark
sum-reduced — X itself, which at production scale would have ~1e12 rows,
never exists anywhere.

Behavioral parity with the reference solver (same active sets / paths on
identical inputs, verified by tests/test_lar.py):

* stop when the mean active-set correlation drops below 1e-12 or more
  than ``max_selected`` features are active (``lar.py:50``);
* step sizes <= 1e-12 are discarded (``lar.py:67``);
* the Lasso drop condition removes a feature whose beta would cross zero
  (``lar.py:71-78``);
* a zero denominator in the step-size computation aborts the loop with a
  warning rather than raising (``lar.py:57-61``);
* if the loop overshoots, the last activated feature is popped
  (``lar.py:94-95``).
"""
from __future__ import annotations

import warnings
from typing import List, Tuple

import numpy as np


def solve_gram(
    gram: np.ndarray,
    corr: np.ndarray,
    max_selected: int,
) -> Tuple[List[int], np.ndarray]:
    """Non-negative LARS/Lasso from sufficient statistics.

    Parameters
    ----------
    gram : (d, d) — ``X^T X``
    corr : (d,) or (d, 1) — ``X^T y``
    max_selected : target number of active features (> 0)

    Returns
    -------
    (active, path) : the active feature indices in activation order, and
    the ``(n_steps, d)`` matrix of beta after each LARS step.
    """
    if max_selected <= 0:
        raise ValueError("max_selected must be positive")
    d = gram.shape[0]
    corr = np.asarray(corr, dtype=np.float64).reshape(d)

    beta = np.zeros(d, dtype=np.float64)
    resid_corr = corr.copy()          # c = X^T (y - X beta)
    steps: List[np.ndarray] = []

    first = int(np.argmax(resid_corr))
    top_corr = float(resid_corr[first])
    active: List[int] = [first]
    inactive: List[int] = [i for i in range(d) if i != first]

    step_candidates = np.zeros(d + 1, dtype=np.float64)
    while (np.sum(resid_corr[active]) / len(active) >= 1e-12
           and len(active) <= max_selected):
        k = len(active)
        # equiangular direction in the active coordinates:
        # w solves (X_A^T X_A) w = 1
        w = np.linalg.lstsq(
            gram[np.ix_(active, active)], np.ones((k, 1)), rcond=None
        )[0].reshape(k)
        # correlation change rate of every feature along the direction
        rate = gram[:, active] @ w
        denom = rate[active[0]] - rate[inactive]
        if np.any(denom == 0.0):
            warnings.warn(
                "non-negative LARS: zero step denominator — selection is "
                "unreliable; increase the minibatch size", RuntimeWarning)
            break
        # gamma until an inactive feature ties the active correlation
        step_candidates[: d - k] = (top_corr - resid_corr[inactive]) / denom
        # gamma until an active beta hits zero (Lasso drop)
        step_candidates[d - k: d] = -beta[active] / w
        # gamma to full least-squares (correlation reaches zero)
        step_candidates[d] = resid_corr[active[0]] / rate[active[0]]
        step_candidates[step_candidates <= 1e-12] = np.inf

        t = int(np.argmin(step_candidates))
        beta[active] += step_candidates[t] * w

        dropped = d - k <= t < d
        if dropped:
            gone = active[t - d + k]
            active.remove(gone)
            inactive.append(gone)

        resid_corr = corr - gram @ beta
        if not inactive:  # every feature active (max_selected >= d)
            steps.append(beta.copy())
            break
        j = int(np.argmax(resid_corr[inactive]))
        top_corr = float(np.max(resid_corr[inactive]))
        steps.append(beta.copy())
        if not dropped:
            new = inactive[j]
            active.append(new)
            inactive.remove(new)

    if len(active) > max_selected:
        active.pop()

    path = (np.vstack(steps) if steps
            else np.zeros((0, d), dtype=np.float64))
    return active, path


def solve(
    x: np.ndarray,
    y: np.ndarray,
    max_selected: int,
) -> Tuple[List[int], np.ndarray]:
    """Dense-design convenience wrapper: forms ``X^T X`` / ``X^T y`` and
    delegates to :func:`solve_gram` (matches the reference entry point
    ``lar.solve``, ``lar/lar.py:7``)."""
    x = np.asarray(x, dtype=np.float64)
    return solve_gram(x.T @ x, x.T @ np.asarray(y, dtype=np.float64),
                      max_selected)
