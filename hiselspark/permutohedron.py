"""Permutation sampling via Haar-random rotations projected onto the
permutohedron — the search-space sampler of the greedy HSIC and
categorical searches (reference ``hisel/permutohedron.py:6-27``).

The construction: sample U ~ Haar on SO(d-1), take the columns of
[U, -U] as directions, map them through the permutohedron projection
matrix, and read the induced coordinate order (argsort) — each direction
yields a permutation of {0..d-1}; Haar-uniform directions give a
well-spread (not uniform) distribution over permutations.

Haar sampling itself uses the QR-of-Gaussian construction with the
R-diagonal sign fix (Mezzadri 2007, "How to generate random matrices
from the classical compact groups") plus a determinant fix into SO(n) —
scipy is not available in this sandbox.
"""
from __future__ import annotations

from typing import Optional, Set, Tuple

import numpy as np


def haar_rotations(dim: int, size: int = 1,
                   random_state: Optional[int] = None) -> np.ndarray:
    """``(size, dim, dim)`` Haar-distributed SO(dim) matrices."""
    rng = np.random.default_rng(random_state)
    out = np.empty((size, dim, dim))
    for i in range(size):
        z = rng.standard_normal((dim, dim))
        q, r = np.linalg.qr(z)
        q = q * np.sign(np.diag(r))[None, :]
        if np.linalg.det(q) < 0:
            q[:, 0] = -q[:, 0]
        out[i] = q
    return out


def projection_matrix(d: int) -> np.ndarray:
    """``(d-1, d)`` matrix whose rows span the permutohedron hyperplane
    (same construction as the reference: lower-triangular ones with a
    ``-k`` superdiagonal, rows normalized)."""
    p = np.diag(np.arange(-1, -d, -1, dtype=float), 1)
    p += np.eye(d)
    for k in range(1, d):
        p += np.diag(np.ones(d - k), -k)
    p = p[: d - 1, :]
    return p / np.linalg.norm(p, axis=1, keepdims=True)


def sample_permutations(d: int, size: int = 1,
                        random_state: Optional[int] = None
                        ) -> Set[Tuple[int, ...]]:
    """Sample a set of permutations of ``{0..d-1}`` (2d per rotation,
    deduplicated).  ``d == 1`` degenerates to the identity."""
    if d < 2:
        return {(0,)}
    u = haar_rotations(d - 1, size, random_state)
    directions = np.concatenate((u, -u), axis=2)      # (size, d-1, 2(d-1))
    proj = projection_matrix(d).T[None, :, :]          # (1, d, d-1)
    coords = proj @ directions                        # (size, d, 2(d-1))
    orders = np.argsort(coords, axis=1)
    return {tuple(orders[s, :, j])
            for s in range(orders.shape[0])
            for j in range(orders.shape[2])}
