"""Approximate nearest-neighbour search over an embedding column.

* :func:`cosine_topk` — brute-force exact top-k: probes x corpus cross
  join with JVM-side ``zip_with``/``aggregate`` dot products.  The
  baseline and the verifier; O(P x N), use when P is small or N is
  bucketed.
* :func:`lsh_topk` — random-hyperplane LSH: a 64-bit sign signature per
  vector (deterministic seeded hyperplanes), candidates restricted to
  vectors sharing at least one signature band with the probe (multi-
  probe across bands), exact cosine re-ranking inside the candidate
  set.  This is the scale path: the cross join collapses from N to the
  bucket population.
* :func:`embedding_near_duplicates` — all pairs with cosine above a
  threshold (near-dup detection for embedding columns).

Hyperplanes are generated from a seeded counter hash (no RNG state),
so signatures are reproducible across runs and partitionings.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(c):
    return F.sqrt(_dot(c, c))


def with_unit_vectors(df: DataFrame, vec_col: str = "embedding",
                      out_col: str = "unit") -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    return df.withColumn(out_col,
                         F.transform(v, lambda x: x / _norm(v)))


def cosine_topk(probes: DataFrame, corpus: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                probe_id_col: Optional[str] = None) -> DataFrame:
    """Exact top-k by cosine: returns (probe_id, rk, vec_id, cos_sim).
    Ties broken by ascending corpus id for determinism."""
    probe_id_col = probe_id_col or id_col
    p = probes.select(F.col(probe_id_col).alias("probe_id"),
                      F.col(vec_col).cast("array<double>").alias("p"))
    c = corpus.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).cast("array<double>").alias("v"))
    pairs = (p.crossJoin(c)
             .filter(F.col("probe_id") != F.col("vec_id"))
             .withColumn("cos", _dot("p", "v")
                         / (_norm(F.col("p")) * _norm(F.col("v")))))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc())
    return (pairs.withColumn("rk", F.row_number().over(w))
                 .filter(F.col("rk") <= k)
                 .select("probe_id", "rk", "vec_id",
                         F.col("cos").alias("cos_sim")))


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic Gaussian hyperplanes from a counter-based hash —
    reproducible across runs without RNG state."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def with_lsh_signature(df: DataFrame, dim: int, vec_col: str = "embedding",
                       n_planes: int = 64, seed: int = 7,
                       band_bits: int = 8,
                       out_col: str = "lsh_sig") -> DataFrame:
    """Sign-of-projection signature: bit i = 1[<v, h_i> > 0], packed
    into ``n_planes/band_bits`` band keys (array<int>).

    Recall math (random hyperplanes): two vectors at angle theta agree
    on one bit with p = 1 - theta/pi, on a whole band with p^band_bits,
    and miss ALL B bands with (1-p^band_bits)^B.  Narrow bands (8 bits)
    + many bands favor recall for moderate-cosine top-k; wide bands
    (16 bits) cut candidate volume for high-cosine near-dup mining."""
    planes = _hyperplanes(dim, n_planes, seed)
    v = F.col(vec_col).cast("array<double>")
    bits = [
        (F.aggregate(
            F.zip_with(v, F.array(*[F.lit(float(w)) for w in planes[i]]),
                       lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x) > 0).cast("int")
        for i in range(n_planes)
    ]
    n_bands = n_planes // band_bits
    bands = []
    for b in range(n_bands):
        key = F.lit(0)
        for j in range(band_bits):
            key = key + bits[b * band_bits + j] * F.lit(2 ** j)
        bands.append(key)
    return df.withColumn(out_col, F.array(*bands))


def lsh_topk(probes: DataFrame, corpus: DataFrame, dim: int, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             probe_id_col: Optional[str] = None,
             n_planes: int = 64, seed: int = 7,
             band_bits: int = 8) -> DataFrame:
    """Approximate top-k: candidates share >= 1 LSH band with the
    probe; exact cosine re-rank inside the candidates.  Same output
    shape as :func:`cosine_topk` (rows may be fewer than k when the
    buckets are sparse — the recall/cost dial is ``n_planes`` per
    band)."""
    probe_id_col = probe_id_col or id_col
    p = with_lsh_signature(
        probes.select(F.col(probe_id_col).alias("probe_id"),
                      F.col(vec_col).cast("array<double>").alias("p")),
        dim, "p", n_planes, seed, band_bits)
    c = with_lsh_signature(
        corpus.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).cast("array<double>").alias("v")),
        dim, "v", n_planes, seed, band_bits)
    pb = p.select(
        "probe_id", "p",
        F.explode(F.expr(
            "transform(lsh_sig, (s, i) -> struct(i as band, s as key))"))
        .alias("bb"))
    cb = c.select(
        "vec_id", "v",
        F.explode(F.expr(
            "transform(lsh_sig, (s, i) -> struct(i as band, s as key))"))
        .alias("bb"))
    cands = (pb.join(cb, "bb")
             .filter(F.col("probe_id") != F.col("vec_id"))
             .select("probe_id", "p", "vec_id", "v").distinct())
    scored = cands.withColumn(
        "cos", _dot("p", "v") / (_norm(F.col("p")) * _norm(F.col("v"))))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
                  .filter(F.col("rk") <= k)
                  .select("probe_id", "rk", "vec_id",
                          F.col("cos").alias("cos_sim")))


def embedding_near_duplicates(df: DataFrame, dim: int,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              threshold: float = 0.95,
                              use_lsh: bool = True,
                              n_planes: int = 64,
                              seed: int = 7,
                              band_bits: int = 16) -> DataFrame:
    """Pairs (a < b) with cosine >= threshold.  With ``use_lsh`` the
    candidate set is band-bucketed (high thresholds => high recall);
    without it, exact brute force."""
    base = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).cast("array<double>").alias("v"))
    if use_lsh:
        s = with_lsh_signature(base, dim, "v", n_planes, seed, band_bits)
        sb = s.select("id", "v", F.explode(F.expr(
            "transform(lsh_sig, (x, i) -> struct(i as band, x as key))"))
            .alias("bb"))
        pairs = (sb.alias("l").join(sb.alias("r"), "bb")
                 .filter(F.col("l.id") < F.col("r.id"))
                 .select(F.col("l.id").alias("a"), F.col("l.v").alias("va"),
                         F.col("r.id").alias("b"), F.col("r.v").alias("vb"))
                 .distinct())
    else:
        l = base.select(F.col("id").alias("a"), F.col("v").alias("va"))
        r = base.select(F.col("id").alias("b"), F.col("v").alias("vb"))
        pairs = l.crossJoin(r).filter(F.col("a") < F.col("b"))
    return (pairs.withColumn(
                "cos", _dot("va", "vb")
                / (_norm(F.col("va")) * _norm(F.col("vb"))))
            .filter(F.col("cos") >= threshold)
            .select("a", "b", F.col("cos").alias("cos_sim")))
