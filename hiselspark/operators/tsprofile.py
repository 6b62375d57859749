"""Per-entity time-series feature bundle (tsfresh-style), one pass.

The standard catalogue features a training pipeline extracts per
series before modeling (Christ et al., "Time Series FeatuRe
Extraction on basis of Scalable Hypothesis tests", Neurocomputing
2018 — the tsfresh catalogue):

* ``abs_energy``        Σ v²                       (exact integer)
* ``mean_abs_change``   Σ|v_{i+1} − v_i| / (n−1)   (one division)
* ``n_peaks``           # strict local maxima (both neighbors lower)
* ``count_above_mean``  # points with v > mean — compared as the
                        EXACT integer test ``v·n > Σv`` (no float
                        mean anywhere)
* ``longest_above``     longest run of consecutive points above the
                        mean (same exact test), via gaps-and-islands
* ``first_max_idx`` / ``last_max_idx``  1-based positions of the
                        series maximum (time order)

Scale shape: ONE entity shuffle does everything — the ordered window
(lag/lead/row_number), the whole-partition totals (sum/count over the
same partitioning, which Spark serves from the already-shuffled
exchange), one groupBy(entity) reduction, and a gaps-and-islands
sub-aggregation for the run length that reuses the same entity
partitioning (Spark's subset-cluster-keys rule: a (entity, run)
grouping reuses an entity-only exchange).  No self-joins, no
per-entity collection.

Determinism: values are integers (cast upstream); every feature
except the final ``mean_abs_change`` division is exact integer
arithmetic, including the above-mean test ``v·n > Σv``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def ts_profile(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """One row per entity with the catalogue features above.  Series
    order is (``ts_col``, ``order_col``) — the tiebreaker makes every
    lag/lead and index engine-reproducible."""
    t = (F.unix_micros(F.col(ts_col).cast("timestamp"))
         .cast("long").alias("__t"))
    base = df.select(
        F.col(entity_col).alias("entity"), t,
        F.col(order_col).cast("long").alias("__o"),
        F.col(value_col).cast("long").alias("v"))
    w_ord = Window.partitionBy("entity").orderBy("__t", "__o")
    w_all = Window.partitionBy("entity")
    # islands keyed by idx − running-count-of-above (NULL key off-run):
    # computed on the SAME ordered window, so the whole operator is a
    # single consumer chain — window → groupBy(entity, run) →
    # groupBy(entity), all served by ONE entity exchange (Spark's
    # subset-cluster-keys rule); no second branch, no self-join
    cur = (base
           .withColumn("idx", F.row_number().over(w_ord))
           .withColumn("prev", F.lag("v").over(w_ord))
           .withColumn("nxt", F.lead("v").over(w_ord))
           .withColumn("s_tot", F.sum("v").over(w_all))
           .withColumn("n_tot", F.count(F.lit(1)).over(w_all))
           .withColumn("v_max", F.max("v").over(w_all))
           .withColumn("above",
                       F.col("v") * F.col("n_tot") > F.col("s_tot")))
    cur = (cur
           .withColumn("__acnt",
                       F.sum(F.when(F.col("above"), 1).otherwise(0))
                       .over(w_ord))
           .withColumn("__grp",
                       F.when(F.col("above"),
                              F.col("idx") - F.col("__acnt"))))
    per_run = (cur.groupBy("entity", "__grp").agg(
        F.count(F.lit(1)).alias("__rows"),
        F.max("n_tot").alias("__n"),
        F.sum(F.col("v") * F.col("v")).alias("__energy"),
        F.sum(F.abs(F.col("v") - F.col("prev"))).alias("__ac"),
        F.sum(F.when((F.col("prev").isNotNull())
                     & (F.col("nxt").isNotNull())
                     & (F.col("v") > F.col("prev"))
                     & (F.col("v") > F.col("nxt")), 1)
              .otherwise(0)).alias("__peaks"),
        F.min(F.when(F.col("v") == F.col("v_max"), F.col("idx")))
         .alias("__fmax"),
        F.max(F.when(F.col("v") == F.col("v_max"), F.col("idx")))
         .alias("__lmax")))
    out = (per_run.groupBy("entity").agg(
        F.max("__n").alias("n"),
        F.sum("__energy").alias("abs_energy"),
        F.sum("__ac").alias("__sum_ac"),
        F.sum("__peaks").alias("n_peaks"),
        F.sum(F.when(F.col("__grp").isNotNull(), F.col("__rows"))
              .otherwise(0)).alias("count_above_mean"),
        F.max(F.when(F.col("__grp").isNotNull(), F.col("__rows")))
         .alias("longest_above"),
        F.min("__fmax").alias("first_max_idx"),
        F.max("__lmax").alias("last_max_idx")))
    mac = (F.when(F.col("n") > 1,
                  F.col("__sum_ac").cast("double")
                  / (F.col("n") - 1).cast("double"))
           .otherwise(F.lit(None).cast("double"))
           .alias("mean_abs_change"))
    return out.select(
        "entity", "n", "abs_energy", mac, "n_peaks",
        "count_above_mean",
        F.coalesce("longest_above", F.lit(0)).alias("longest_above"),
        "first_max_idx", "last_max_idx")
