"""Reconciliation against pyHSICLasso's PUBLISHED kernel formulas
(SURVEY.md §2.1 K16; reference kernels.py:275-320 plays the same role).

pyHSICLasso (Yamada et al., "High-Dimensional Feature Selection by
Feature-Wise Kernelized Lasso", Neural Computation 2014; pip package
``pyHSICLasso``) is not installed in this sandbox, so — exactly like
the reference's own reconciliation tests (tests/kernel_test.py:16-58),
which skip unless the package is importable — the published formulas
are implemented HERE, independently and directly from their public
definitions, and our kernel path is checked against them:

* Gaussian kernel: ``K[i,j] = exp(-||x_i - x_j||^2 / (2 sigma^2))``;
* normalized delta kernel: ``K[i,j] = 1/n_c`` iff ``x_i = x_j = c``;
* block HSIC-Lasso per-feature design column: ``vec(H K H)`` scaled by
  the Frobenius norm of the centered Gram.

These helpers are test oracles only — the engine's production path is
``hiselspark.kernels`` (verified allclose against the actual reference
via tests/refshim.py elsewhere in the suite).
"""
from __future__ import annotations

import numpy as np
import pytest

from hiselspark import kernels


# -- pyHSICLasso published formulas, implemented independently ------------

def pyhl_kernel_gaussian(x: np.ndarray, sigma: float) -> np.ndarray:
    """(n,) samples of ONE feature -> (n, n) Gaussian Gram, the
    textbook double-loop definition (deliberately naive: the oracle
    should not share code shape with the implementation under test)."""
    n = len(x)
    k = np.empty((n, n))
    for i in range(n):
        for j in range(n):
            d = x[i] - x[j]
            k[i, j] = np.exp(-(d * d) / (2.0 * sigma * sigma))
    return k


def pyhl_kernel_delta_norm(x: np.ndarray) -> np.ndarray:
    """(n,) integer samples -> (n, n) delta kernel normalized by class
    count: K[i,j] = 1/n_c iff x_i == x_j == c."""
    n = len(x)
    counts = {v: int((x == v).sum()) for v in np.unique(x)}
    k = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            if x[i] == x[j]:
                k[i, j] = 1.0 / counts[x[i]]
    return k


def pyhl_centered_normalized(k: np.ndarray) -> np.ndarray:
    """H K H (explicit H = I - 11^T/n matmul) scaled to unit Frobenius
    norm — pyHSICLasso's per-feature design block."""
    n = k.shape[0]
    h = np.eye(n) - np.ones((n, n)) / n
    kc = h @ k @ h
    return kc / np.linalg.norm(kc, "fro")


# -- reconciliation --------------------------------------------------------

@pytest.fixture(scope="module")
def xy():
    rng = np.random.default_rng(5)
    xc = rng.normal(size=(40, 3))           # continuous features
    xd = rng.integers(0, 4, size=(40, 2))   # categorical features
    return xc, xd


def test_rbf_gram_matches_published_gaussian(xy):
    xc, _ = xy
    ours = kernels.rbf_gram_featurewise(xc, bandwidth=1.3)
    for f in range(xc.shape[1]):
        np.testing.assert_allclose(
            ours[f], pyhl_kernel_gaussian(xc[:, f], 1.3), rtol=1e-12)


def test_delta_gram_matches_published_delta_norm(xy):
    _, xd = xy
    ours = kernels.delta_gram_featurewise(xd)
    for f in range(xd.shape[1]):
        np.testing.assert_allclose(
            ours[f], pyhl_kernel_delta_norm(xd[:, f]), rtol=1e-12)


def test_double_center_matches_explicit_hgh(xy):
    xc, _ = xy
    g = kernels.rbf_gram_featurewise(xc, bandwidth=1.0)
    n = g.shape[-1]
    h = np.eye(n) - np.ones((n, n)) / n
    for f in range(g.shape[0]):
        np.testing.assert_allclose(
            kernels.double_center(g[f]), h @ g[f] @ h, atol=1e-12)


def test_frobenius_normalized_block_reconciles(xy):
    """Our centered Gram, Frobenius-normalized, equals pyHSICLasso's
    design block — i.e. the two formulations differ only by the scalar
    the reference also documents (hisel does not Frobenius-normalize;
    pyHSICLasso does)."""
    xc, _ = xy
    for f in range(xc.shape[1]):
        ours = kernels.double_center(
            kernels.rbf_gram_featurewise(xc, bandwidth=1.0)[f])
        ours = ours / np.linalg.norm(ours, "fro")
        theirs = pyhl_centered_normalized(
            pyhl_kernel_gaussian(xc[:, f], 1.0))
        np.testing.assert_allclose(ours, theirs, atol=1e-12)
