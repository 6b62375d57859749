"""Distributed PCA (exact-integer sufficient statistics) vs NumPy."""
import numpy as np
import pandas as pd
import pytest

from hiselspark.operators.projection import pca_fit, pca_project

Q = 1_000_000


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(5)
    n, d = 400, 16
    A = rng.normal(size=(d, d))
    X = (rng.normal(size=(n, 4)) @ A[:4]
         + 0.05 * rng.normal(size=(n, d))).astype(np.float32)
    pdf = pd.DataFrame({
        "vec_id": range(n),
        "embedding": [[float(v) for v in row] for row in X],
    })
    return X, spark.createDataFrame(pdf)


def test_pca_matches_numpy_eigh(emb_df):
    X, df = emb_df
    m = pca_fit(df, k=6)
    Xq = np.rint(X.astype(np.float64) * Q) / Q  # the operator's quantized view
    C = np.cov(Xq, rowvar=False)
    w, V = np.linalg.eigh(C)
    order = np.argsort(w)[::-1][:6]
    assert np.allclose(m.eigenvalues, w[order], rtol=1e-9)
    comps = V[:, order].T.copy()
    for i in range(6):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    assert np.allclose(m.components, comps, atol=1e-8)
    assert np.allclose(m.mean, Xq.mean(axis=0), atol=1e-12)
    # 4 planted directions dominate
    assert m.explained_ratio[:4].sum() > 0.99
    # components orthonormal
    assert np.allclose(m.components @ m.components.T, np.eye(6),
                       atol=1e-10)


def test_pca_fit_is_layout_deterministic(emb_df):
    _, df = emb_df
    m1 = pca_fit(df, k=5)
    m2 = pca_fit(df.repartition(7), k=5)
    assert np.array_equal(m1.components, m2.components)
    assert np.array_equal(m1.eigenvalues, m2.eigenvalues)
    assert np.array_equal(m1.mean, m2.mean)


def test_pca_project_matches_matmul(emb_df):
    X, df = emb_df
    m = pca_fit(df, k=3)
    out = (pca_project(df, m).toPandas()
           .sort_values("vec_id").reset_index(drop=True))
    got = np.stack(out["proj"].to_numpy())
    want = (X.astype(np.float64) - m.mean) @ m.components.T
    assert got.shape == (len(X), 3)
    assert np.allclose(got, want, atol=1e-9)
