"""The flagship end-to-end pipeline (north star): point-in-time
feature assembly over an image+caption corpus followed by HSIC-Lasso
feature selection.

Stages (each a documented operator elsewhere in the package):

1. featurize images — phash→64 bit features + hamming weight (JVM
   expressions), decoded-pixel statistics (Arrow ``mapInPandas``),
   caption length/token counts (JVM expressions);
2. entity-timeline engineering — sessionize + lags + trailing rolling
   aggregates, all sharing ONE ``(entity, ts)`` shuffle;
3. leakage-free as-of join of labels onto the feature timeline
   (backward, strict ``feature_ts <= label_ts``);
4. distributed HSIC-Lasso: per-minibatch sufficient statistics inside
   ``applyInPandas``/``mapInPandas``, sum-reduce, driver LARS.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, functions as F

from .functions.image import (phash_bit_columns, phash_hamming_weight,
                              with_pixel_stats)
from .functions.text import with_caption_features
from .operators.asof import asof_join
from .operators.windows import rolling_aggregates, sessionize, with_lags
from .selection import SelectionResult, SparkHSICSelector


def featurize_images(images: DataFrame, n_phash_bits: int = 16) -> DataFrame:
    """Image rows -> numeric/categorical feature columns (payload
    dropped after pixel stats — blobs never cross a shuffle)."""
    df = phash_hamming_weight(images)
    df = phash_bit_columns(df, n_bits=n_phash_bits)
    df = with_caption_features(df)
    df = with_pixel_stats(df)
    # raw phash is near-unique per image — useless (and harmful) as a
    # delta-kernel feature; its information rides in the bit columns
    return df.drop("caption", "fmt", "image_id", "phash")


def engineer_timeline(
    feats: DataFrame,
    entity_col: str = "entity_id",
    ts_col: str = "ts",
    lag_cols: Tuple[str, ...] = ("px_mean_r", "caption_tokens"),
    rolling_col: str = "px_mean_g",
    rolling_window_s: float = 6 * 3600.0,
    session_gap_s: float = 1800.0,
    bucket_seconds: Optional[float] = None,
) -> DataFrame:
    """Windowed features over the entity timeline.

    With ``bucket_seconds=None`` every operator shares one entity-key
    clustering (one shuffle) — simplest plan, but a hot entity's whole
    timeline lands in one task.  With ``bucket_seconds`` set, the
    skew-proof chunked twins (operators/chunked.py) cluster by
    (entity, time-bucket): bit-identical results, straggler-free —
    the production setting for skewed corpora."""
    lag_present = [c for c in lag_cols if c in feats.columns]
    if bucket_seconds is None:
        df = sessionize(feats, entity_col, ts_col,
                        gap_seconds=session_gap_s)
        df = with_lags(df, entity_col, ts_col, lag_present, lags=(1,))
        df = rolling_aggregates(df, entity_col, ts_col,
                                {rolling_col: ["mean", "count"]},
                                window_seconds=rolling_window_s)
        return df
    from .operators.chunked import chunked_timeline_features
    if rolling_window_s > bucket_seconds:
        raise ValueError("bucket_seconds must cover the rolling window")
    return chunked_timeline_features(
        feats, entity_col, ts_col,
        lag_cols=lag_present, lags=(1,),
        rolling_aggs={rolling_col: ["mean", "count"]},
        rolling_window_s=rolling_window_s,
        session_gap_s=session_gap_s,
        bucket_seconds=bucket_seconds)


def assemble_training_frame(
    images,
    labels: DataFrame,
    n_phash_bits: int = 16,
    tolerance_seconds: Optional[float] = None,
    bucket_seconds: Optional[float] = None,
) -> Tuple[DataFrame, List[str]]:
    """Full point-in-time feature matrix: one row per label
    ``(entity_id, label_ts)`` with the feature vector as of that
    moment (backward as-of, zero leakage).  Returns (frame, feature
    column names).  ``bucket_seconds`` routes the timeline windows AND
    the as-of join through the skew-proof chunked operators.

    ``images`` is either a DataFrame (blobs cross the Arrow socket into
    the pixel-stats worker) or a parquet directory path / explicit file
    list (e.g. a snapshot's committed files), which routes through the
    scan-fused featurizer (``sources/fused_scan.py``): tasks open their
    row groups directly, so image bytes never touch the JVM — the
    production setting for payload-heavy corpora."""
    if isinstance(images, (str, list, tuple)):
        from .sources.fused_scan import featurize_images_fused
        featurized = featurize_images_fused(labels.sparkSession, images,
                                            n_phash_bits)
    else:
        featurized = featurize_images(images, n_phash_bits)
    feats = engineer_timeline(featurized, bucket_seconds=bucket_seconds)
    feature_cols = [c for c in feats.columns
                    if c not in ("entity_id", "ts")]
    if bucket_seconds is None:
        join_fn = asof_join
        join_kw = {}
    else:
        from .operators.chunked import chunked_asof_join
        join_fn = chunked_asof_join
        join_kw = {"bucket_seconds": bucket_seconds}
    joined = join_fn(
        labels.withColumnRenamed("label_ts", "ts"),
        feats,
        on="entity_id", left_ts="ts", right_ts="ts",
        value_cols=feature_cols,
        tolerance_seconds=tolerance_seconds,
        **join_kw,
    )
    # drop label rows with no (complete) feature vector: pre-history
    # labels and first-of-entity rows with null lags
    out = joined.dropna(subset=feature_cols)
    return out, feature_cols


def select_features_pointintime(
    images,
    labels: DataFrame,
    number_of_features: int = 5,
    n_phash_bits: int = 16,
    minibatch_size: int = 200,
    mode: str = "scale",
    bucket_seconds: Optional[float] = 7 * 86400.0,
    precision: str = "float64",
) -> SelectionResult:
    """The north-star query: which point-in-time features carry
    dependence with the label, ranked by HSIC-Lasso.

    Feature hygiene learned the hard way (and worth documenting): the
    normalized delta kernel scales Gram entries by 1/class-count, so
    raw HSIC scores of categorical features are not magnitude-comparable
    with RBF-kernel scores — mixing informative features across kernel
    families biases non-negative LARS toward the RBF side (the reference
    inherits the same asymmetry; its tests never mix informative
    families).  Low-cardinality integer features (hash bits, token
    counts) are therefore cast to double and routed through the RBF
    kernel, and near-unique identifier-like columns (session_id) are
    excluded — identity-shaped Grams carry spuriously large HSIC mass.
    """
    frame, feature_cols = assemble_training_frame(
        images, labels, n_phash_bits=n_phash_bits,
        bucket_seconds=bucket_seconds)
    feature_cols = [c for c in feature_cols if c != "session_id"]
    frame = frame.select(
        F.col("y").cast("double").alias("y"),
        *[F.col(c).cast("double").alias(c) for c in feature_cols])
    sel = SparkHSICSelector(frame, feature_cols, ["y"])
    # precision='float32' halves Gram-tile memory traffic (2.5-2.9x on
    # the bandwidth-bound core, see BASELINE.md) — the corpus-scale
    # opt-in; float64 stays the default wherever the reference parity
    # contract applies
    return sel.run(number_of_features=number_of_features,
                   minibatch_size=minibatch_size, mode=mode,
                   precision=precision)
