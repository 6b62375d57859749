"""spark-submit entry point for model evaluation: exact ROC-AUC,
calibration/reliability table, confusion metrics at a threshold, and
score-distribution drift between two time windows — one JSON report on
stdout (and optionally to a file).  The post-scoring twin of
``run_quality.py``: run it after every batch-scoring job to catch a
degrading or drifting model before it ships features/labels
downstream.

Usage (cluster)::

    zip -r engine.zip hiselspark/
    spark-submit --py-files engine.zip jobs/run_eval.py \
        --table /warehouse/scored --score-col score --label-col label \
        --score-scale 1000 --threshold 500 [--out report.json]

The score column must be integer-quantized (``prob * score_scale`` —
the engine convention: quantization bounds the distinct-score table so
AUC/ROC are exact at any row count).  All metrics come from
``hiselspark/operators/evaluate.py`` (exact integer counting, no
sampling) and ``operators/drift.py`` (PSI).

``--demo`` scores the synthetic events table (clamped cents as the
score, value>10.00 as the label) so the job runs end-to-end with no
arguments to invent.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = (
    _ROOT + os.pathsep + os.environ.get("PYTHONPATH", ""))

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--table", help="parquet path of the scored table")
    p.add_argument("--score-col", default="score")
    p.add_argument("--label-col", default="label")
    p.add_argument("--ts-col", default="ts")
    p.add_argument("--score-scale", type=int, default=1000)
    p.add_argument("--threshold", type=int, default=None,
                   help="confusion threshold in score units "
                        "(default: score_scale // 2)")
    p.add_argument("--bins", type=int, default=10)
    p.add_argument("--split-ts", default=None,
                   help="ISO timestamp splitting reference vs current "
                        "for score-drift PSI (default: median row time)")
    p.add_argument("--out", default=None, help="also write JSON here")
    p.add_argument("--demo", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.demo and not args.table:
        args.table = "/root/testdata/sf0.001/events.parquet"
    if not args.table:
        raise SystemExit("--table (or --demo) is required")
    if args.threshold is None:
        args.threshold = args.score_scale // 2

    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder.appName("hiselspark-eval")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from hiselspark.operators.drift import psi_drift
    from hiselspark.operators.evaluate import (binary_auc,
                                               calibration_bins,
                                               confusion_at, roc_curve)

    df = spark.read.parquet(args.table)
    if args.demo:
        cents = F.round(F.col("value") * 100).cast("long")
        df = (df.withColumn(args.score_col,
                            F.least(cents, F.lit(args.score_scale))
                            .cast("long"))
                .withColumn(args.label_col,
                            (cents > 1000).cast("long")))

    auc = binary_auc(df, args.score_col, args.label_col).collect()[0]
    cal = [r.asDict() for r in
           calibration_bins(df, args.score_col, args.label_col,
                            n_bins=args.bins,
                            score_scale=args.score_scale)
           .orderBy("bin").collect()]
    conf = confusion_at(df, args.score_col, args.label_col,
                        args.threshold).collect()[0].asDict()
    n_roc = roc_curve(df, args.score_col, args.label_col).count()

    split = args.split_ts
    if split is None:
        split = str(df.agg(F.timestamp_seconds(F.expr(
            f"percentile(cast(cast({args.ts_col} as timestamp)"
            f" as double), 0.5)")).alias("m"))
            .collect()[0][0])
    bucket = F.least(
        F.floor(F.col(args.score_col) * args.bins / args.score_scale),
        F.lit(args.bins - 1)).cast("long")
    drift = [r.asDict() for r in
             psi_drift(df.withColumn("__b", bucket)
                         .withColumn("__all", F.lit("all")),
                       ["__all"], "__b",
                       F.col(args.ts_col).cast("timestamp")
                       < F.lit(split).cast("timestamp")).collect()]

    ece = (sum(c["n"] * abs(c["mean_pred"] - c["frac_pos"])
               for c in cal)
           / max(1, sum(c["n"] for c in cal)))
    report = {
        "table": args.table,
        "auc": auc["auc"], "n_pos": auc["n_pos"], "n_neg": auc["n_neg"],
        "threshold": args.threshold,
        "confusion": conf,
        "calibration": cal,
        "expected_calibration_error": ece,
        "roc_points": n_roc,
        "score_drift_split_ts": split,
        "score_psi": max((d["psi"] for d in drift), default=None),
    }
    line = json.dumps(report, default=str)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
