"""Mutual-information preselection (distributed stand-in for the
reference's ``ksgmi``, ``/root/reference/hisel/select.py:45-75``).

The reference calls sklearn's ``mutual_info_{classif,regression}``
(KSG k-NN estimator) per feature, normalizes by the max MI, and keeps
features with normalized MI above a threshold — a cheap pre-filter that
shrinks ``d`` before the expensive Gram stage.  sklearn is unavailable
here and a k-NN estimator is the wrong shape for Spark anyway, so this
module estimates MI with the classic **equal-frequency histogram
plug-in estimator**: quantile-bin every continuous column (discrete
columns keep their codes), count the joint (feature_bin, target_bin)
contingency in ONE aggregation for all features, and compute MI from
the counts on the driver (d x bins^2 numbers — tiny).

Scale shape: one pass to get approximate quantiles, one shuffle of
(feature_idx, xbin, ybin) counts — both map-side combined.  No UDFs.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _bin_expr(df: DataFrame, col: str, edges: List[float]):
    """Column expression assigning ``col`` to its histogram bin id via
    chained whens over the interior edges (built-ins only)."""
    expr = F.lit(len(edges))
    for i in range(len(edges) - 1, -1, -1):
        expr = F.when(F.col(col) <= F.lit(edges[i]), F.lit(i)).otherwise(expr)
    return expr.cast("int")


def _quantile_edges(df: DataFrame, cols: Sequence[str],
                    n_bins: int, exact: bool = False) -> Dict[str, List[float]]:
    probs = [i / n_bins for i in range(1, n_bins)]
    if exact:
        # exact interpolated percentiles: deterministic across partition
        # layouts (approxQuantile's GK-sketch merge is not), at the cost
        # of an exact percentile aggregate — fine up to moderate n
        row = df.agg(*[
            F.expr(f"percentile({c}, {p})").alias(f"{c}__{i}")
            for c in cols for i, p in enumerate(probs)
        ]).collect()[0].asDict()
        qs = [[float(row[f"{c}__{i}"]) for i in range(len(probs))]
              for c in cols]
    else:
        qs = df.approxQuantile(list(cols), probs, 0.001)
    out = {}
    for c, edges in zip(cols, qs):
        uniq = sorted(set(edges))
        out[c] = uniq
    return out


def mutual_info(
    df: DataFrame,
    feature_cols: Sequence[str],
    target_col: str,
    n_bins: int = 10,
    discrete_features: Sequence[str] = (),
    discrete_target: bool = False,
    exact_edges: bool = False,
) -> pd.Series:
    """Histogram MI (nats) of each feature with the target, all features
    in one aggregation pass."""
    cont_feats = [c for c in feature_cols if c not in set(discrete_features)]
    to_edge = list(cont_feats) + ([] if discrete_target else [target_col])
    edges = (_quantile_edges(df, to_edge, n_bins, exact=exact_edges)
             if to_edge else {})

    ybin = (F.col(target_col).cast("long") if discrete_target
            else _bin_expr(df, target_col, edges[target_col]))
    fbins = [
        (F.col(c).cast("long") if c in set(discrete_features)
         else _bin_expr(df, c, edges[c]))
        for c in feature_cols
    ]
    # melt: one (feature_idx, xbin) struct per feature per row, exploded
    # then counted — a single shuffle keyed on small ints, map-side
    # combined by the partial aggregation.
    pairs = F.array(*[
        F.struct(F.lit(i).alias("fi"), b.alias("xb"))
        for i, b in enumerate(fbins)
    ])
    counts = (df.select(F.explode(pairs).alias("p"), ybin.alias("yb"))
                .groupBy("p.fi", "p.xb", "yb")
                .count()
                .toPandas())

    mis = np.zeros(len(feature_cols))
    for fi, g in counts.groupby("fi"):
        table = g.pivot_table(index="xb", columns="yb", values="count",
                              aggfunc="sum", fill_value=0).to_numpy()
        n = table.sum()
        nz = table > 0
        pij = table[nz] / n
        outer = (table.sum(axis=1)[:, None] * table.sum(axis=0)[None, :])[nz]
        mis[int(fi)] = float(np.sum(
            pij * (np.log(table[nz] * n) - np.log(outer))))
    return pd.Series(mis, index=list(feature_cols))


def mi_preselect(
    df: DataFrame,
    feature_cols: Sequence[str],
    target_cols: Sequence[str],
    threshold: float = 0.01,
    n_bins: int = 10,
    discrete_features: Sequence[str] = (),
    discrete_target: bool = False,
    exact_edges: bool = False,
) -> Tuple[List[str], pd.Series]:
    """Reference ``ksgmi`` semantics: per target column compute per-
    feature MI, normalize by the max across features, keep features with
    normalized MI > threshold; union over target columns.  Returns
    (preselected feature names in input order, raw MI of the last
    target)."""
    keep: set = set()
    mis = None
    for t in target_cols:
        mis = mutual_info(df, feature_cols, t, n_bins,
                          discrete_features, discrete_target,
                          exact_edges=exact_edges)
        mx = float(mis.max())
        if mx <= 0:
            continue
        norm = mis / mx
        keep.update(norm[norm > threshold].index)
    return [c for c in feature_cols if c in keep], mis
