"""Pareto front (skyline) over two maximize-dimensions.

The skyline operator (Börzsönyi et al., ICDE 2001): keep every row
not dominated by another — ``q`` dominates ``p`` when ``q.x ≥ p.x``,
``q.y ≥ p.y`` and at least one is strict.  The curation workhorse for
multi-criteria keep-decisions (quality vs length, relevance vs
freshness) where a single weighted score would bake in an arbitrary
trade-off.

Scale shape — the classic two-phase distributed skyline:

1. **Local skyline per input partition** (Arrow-batched
   ``mapInPandas``, a vectorized sort + grouped cumulative max — no
   Python row loop).  Sound because domination by a row in the same
   partition is domination: every global-skyline row survives its
   partition's local skyline.  This is the 100-TB stage: each task
   reduces its partition to a (typically tiny) candidate set with NO
   shuffle.
2. **Global skyline over the union of local skylines** via two
   RANGE-frame window maxima on the (small) candidate set:
   ``m1 = max(y | x' > x)`` and ``m2 = max(y | x' ≥ x)``; a row is
   dominated iff ``m1 ≥ y`` (strict-x dominator) or ``m2 > y``
   (strict-y dominator) — ties on both dimensions survive, per the
   definition.

Determinism: dimensions are integers (cast upstream); both phases are
pure comparisons, no floats anywhere.
"""
from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F


def _local_skyline(pdf: pd.DataFrame) -> pd.DataFrame:
    if len(pdf) == 0:
        return pdf
    x = pdf["__x"].to_numpy(dtype=np.int64)
    y = pdf["__y"].to_numpy(dtype=np.int64)
    order = np.lexsort((-y, -x))          # x desc, then y desc
    xs, ys = x[order], y[order]
    # prefix max of y over rows with strictly greater x: group rows by
    # equal x, carry the running max only across group boundaries
    new_grp = np.empty(len(xs), dtype=bool)
    new_grp[0] = True
    new_grp[1:] = xs[1:] != xs[:-1]
    run = np.maximum.accumulate(ys)       # max y among x' >= x (prefix)
    grp_starts = np.nonzero(new_grp)[0]
    # value carried into each group = running max just before its start
    carry = np.where(grp_starts > 0, run[grp_starts - 1],
                     np.iinfo(np.int64).min)
    m1 = carry[np.cumsum(new_grp) - 1]
    # m2 = max y among x' >= x: within the sorted order that is the
    # running max at each group's END; ys sorted desc within group, so
    # the group's first element holds the group max
    grp_max = ys[grp_starts][np.cumsum(new_grp) - 1]
    m2 = np.maximum(m1, grp_max)
    keep = ~((m1 >= ys) | (m2 > ys))
    return pdf.iloc[order[keep]]


def pareto_front(
    df: DataFrame,
    x_col: str,
    y_col: str,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Rows on the Pareto front maximizing (``x_col``, ``y_col``),
    both integral.  Returns ``keep_cols + (x, y)``; exact-duplicate
    points all survive (neither dominates)."""
    keep_cols = list(keep_cols)
    base = df.select(*keep_cols,
                     F.col(x_col).cast("long").alias("__x"),
                     F.col(y_col).cast("long").alias("__y"))

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            yield _local_skyline(pdf)

    local = base.mapInPandas(run, base.schema)
    w_gt = (Window.orderBy("__x")
            .rangeBetween(1, Window.unboundedFollowing))
    w_ge = (Window.orderBy("__x")
            .rangeBetween(Window.currentRow, Window.unboundedFollowing))
    out = (local
           .withColumn("__m1", F.max("__y").over(w_gt))
           .withColumn("__m2", F.max("__y").over(w_ge))
           # __m1 is NULL when no row has greater x — not a dominator
           .filter(~((F.col("__m1").isNotNull()
                      & (F.col("__m1") >= F.col("__y")))
                     | (F.col("__m2") > F.col("__y"))))
           .drop("__m1", "__m2"))
    return out.select(*keep_cols, F.col("__x").alias(x_col),
                      F.col("__y").alias(y_col))
