"""Distributed PCA over an embedding column — fit from exact integer
sufficient statistics, project with a broadcast component matrix.

The scale shape mirrors the engine's HSIC kernel stage
(``hiselspark/kernels.py`` sufficient-stats path): the *fit* never
shuffles a single embedding row.  Each partition folds its rows into
one O(d²) partial — count ``n``, coordinate sums ``s`` and the
upper-triangular second-moment ``G = Σ vvᵀ`` — and only those partials
(one tiny row per partition) reach the driver, which assembles the
covariance ``C = (G − s sᵀ/n) / (n−1)``, runs ``eigh`` and broadcasts
the top-k components.  At 10^12 rows that is a map-only pass plus a
num-partitions-sized collect.

Determinism across partitionings (the property the driver gate pins):
embeddings are quantized to integers (``round(v·Q)``, default
``Q = 10^6``) before any summation, partials are accumulated in
arbitrary-precision Python ints and shipped as decimal strings, so the
covariance the driver sees is EXACTLY the same no matter how rows were
batched — no float-reduction-order dependence anywhere.  ``eigh`` on an
identical matrix is then deterministic, and the per-row projection is
pure elementwise float64 math.  Sign convention: each component is
flipped so its largest-|coefficient| entry is positive (ties: lowest
index wins), the standard way to make eigenvectors reproducible.

The reference engine (transferwise/hisel) has no projection operator —
this belongs to the grafted embedding-curation surface, feeding the
ANN/dedup stack (``operators/similarity.py``): projecting 64-d
embeddings to the top principal subspace before LSH/IVF is the
standard recall-per-byte win.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, DoubleType, LongType,
                               StringType, StructField, StructType)

_PARTIAL_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("s", ArrayType(StringType())),
    StructField("g", ArrayType(StringType())),
])


@dataclass
class PCAModel:
    mean: np.ndarray        # (d,) float64
    components: np.ndarray  # (k, d) float64, rows orthonormal
    eigenvalues: np.ndarray  # (k,) float64, descending
    total_variance: float   # trace of the covariance
    n_rows: int

    @property
    def explained_ratio(self) -> np.ndarray:
        return self.eigenvalues / self.total_variance


def _partials(vec_col: str, quant: int):
    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        g = None
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.rint(v * quant).astype(np.int64)
            # per-batch int64 is safe (|q| ≤ Q·max|v|, batch ≤ arrow
            # cap); cross-batch accumulation is arbitrary precision
            bs = q.sum(axis=0, dtype=np.int64)
            bg = q.T @ q
            if s is None:
                d = q.shape[1]
                s = [0] * d
                g = [0] * (d * (d + 1) // 2)
            n += q.shape[0]
            for j in range(len(s)):
                s[j] += int(bs[j])
            pos = 0
            for j in range(len(s)):
                row = bg[j]
                for kk in range(j, len(s)):
                    g[pos] += int(row[kk])
                    pos += 1
        if n:
            yield pd.DataFrame({"n": [n],
                                "s": [[str(x) for x in s]],
                                "g": [[str(x) for x in g]]})

    return fold


def pca_fit(df: DataFrame, vec_col: str = "embedding", k: int = 8,
            quant: int = 1_000_000) -> PCAModel:
    """Fit PCA on ``df[vec_col]`` (array<float>) from one map-only
    pass; see module docstring for the exactness/scale contract."""
    parts = (df.select(vec_col)
               .mapInPandas(_partials(vec_col, quant), _PARTIAL_SCHEMA)
               .collect())
    if not parts:
        raise ValueError("pca_fit: empty input")
    d = len(parts[0]["s"])
    n = sum(p["n"] for p in parts)
    s = [sum(int(p["s"][j]) for p in parts) for j in range(d)]
    tri = [sum(int(p["g"][t]) for p in parts)
           for t in range(d * (d + 1) // 2)]
    return model_from_integer_stats(n, s, tri, d, quant, k)


def model_from_integer_stats(n: int, s, tri, d: int, quant: int,
                             k: int) -> PCAModel:
    """Driver-side model assembly from the EXACT integer partials —
    shared by :func:`pca_fit` and the no-Spark verification twin
    (``hiselspark/twin.py``): identical integers in, bit-identical
    model out."""
    if n < 2:
        raise ValueError(f"pca_fit: need >= 2 rows, got {n}")
    # exact integers -> covariance in float64 (one rounding per entry)
    G = np.zeros((d, d))
    pos = 0
    for j in range(d):
        for kk in range(j, d):
            # (G_jk - s_j s_k / n): keep the exact rational as long as
            # possible — numerator in python ints, ONE division at the end
            num = tri[pos] * n - s[j] * s[kk]
            G[j, kk] = G[kk, j] = num / (n * (n - 1) * quant * quant)
            pos += 1
    w, V = np.linalg.eigh(G)
    order = np.argsort(w)[::-1][:k]
    comps = V[:, order].T.copy()
    for i in range(comps.shape[0]):
        jmax = int(np.argmax(np.abs(comps[i])))
        if comps[i, jmax] < 0:
            comps[i] = -comps[i]
    return PCAModel(mean=np.array(s, dtype=np.float64) / (n * quant),
                    components=comps,
                    eigenvalues=w[order].copy(),
                    total_variance=float(np.trace(G)),
                    n_rows=int(n))


def pca_project(df: DataFrame, model: PCAModel,
                vec_col: str = "embedding",
                out_col: str = "proj") -> DataFrame:
    """Append ``out_col`` = (v − mean) · componentsᵀ as array<double>.
    Pure per-row Arrow-batched math with the (k·d)-sized model closed
    over — no shuffle, no state."""
    spark = df.sparkSession
    mean_b = spark.sparkContext.broadcast(model.mean)
    comp_b = spark.sparkContext.broadcast(model.components)

    @F.pandas_udf(ArrayType(DoubleType()))
    def _proj(col: pd.Series) -> pd.Series:
        v = np.stack(col.to_numpy()).astype(np.float64)
        p = (v - mean_b.value) @ comp_b.value.T
        return pd.Series(list(p))

    return df.withColumn(out_col, _proj(F.col(vec_col)))
