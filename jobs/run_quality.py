"""spark-submit entry point for the data-quality report: profile a
table, evaluate an expectation suite, and measure drift between a
reference and a current time window — one JSON report on stdout (and
optionally to a file).  This is the pre-training go/no-go gate an
orchestrator runs after every ingest/backfill.

Usage (cluster)::

    zip -r engine.zip hiselspark/
    spark-submit --py-files engine.zip jobs/run_quality.py \
        --table /warehouse/events --ts-col ts --key-col event_id \
        --value-col value --segment-col event_type \
        --split-ts 2024-01-16T00:00:00 [--out report.json]

Components (all single-pass aggregates; see the operator modules for
the plan shapes):

* ``profile``      — per-column nulls / approx-distinct / min / max;
* ``expectations`` — not-null on the key + configurable value range,
                     plus key uniqueness (exact);
* ``drift``        — PSI of the value distribution per segment between
                     rows before and after ``--split-ts``.

``--demo`` runs against the synthetic events table at
``/root/testdata/sf0.001`` so the job is runnable end-to-end with no
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
    p.add_argument("--table", help="parquet path of the table to audit")
    p.add_argument("--ts-col", default="ts")
    p.add_argument("--key-col", default="event_id")
    p.add_argument("--value-col", default="value")
    p.add_argument("--segment-col", default="event_type")
    p.add_argument("--split-ts", default=None,
                   help="ISO timestamp splitting reference vs current "
                        "for drift (default: median row time)")
    p.add_argument("--value-range", nargs=2, type=float, default=None,
                   metavar=("LO", "HI"))
    p.add_argument("--psi-buckets", type=int, default=25)
    p.add_argument("--out", default=None, help="also write JSON here")
    p.add_argument("--demo", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.demo and not args.table:
        args.table = "/root/testdata/sf0.001/events.parquet"
    if not args.table:
        raise SystemExit("--table (or --demo) is required")

    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder.appName("hiselspark-quality")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from hiselspark.operators.drift import psi_drift
    from hiselspark.operators.expectations import (check_expectations,
                                                   in_range, not_null)
    from hiselspark.operators.profile import profile_table

    df = spark.read.parquet(args.table)

    prof = {r["column"]: {k: r[k] for k in
                          ("n_rows", "n_null", "n_distinct_approx",
                           "min_repr", "max_repr")}
            for r in profile_table(df).collect()}

    rules = [not_null(args.key_col), not_null(args.ts_col)]
    if args.value_range:
        lo, hi = args.value_range
        rules.append(in_range(args.value_col, lo, hi))
    exp = [r.asDict() for r in
           check_expectations(df, rules,
                              unique_cols=[args.key_col]).collect()]

    split = args.split_ts
    if split is None:
        split = str(df.agg(F.timestamp_seconds(F.expr(
            f"percentile(cast(cast({args.ts_col} as timestamp)"
            f" as double), 0.5)")).alias("m"))
            .collect()[0][0])
    bucket = F.least(
        F.floor(F.col(args.value_col).cast("double")), F.lit(1000.0)
    ).cast("long")
    drift = [r.asDict() for r in
             psi_drift(df.withColumn("__b", bucket),
                       [args.segment_col], "__b",
                       F.col(args.ts_col).cast("timestamp")
                       < F.lit(split).cast("timestamp")).collect()]

    report = {
        "table": args.table,
        "profile": prof,
        "expectations": exp,
        "drift_split_ts": split,
        "drift": drift,
        "worst_psi": max((d["psi"] for d in drift), default=None),
        "all_expectations_pass": all(e["pass"] for e in exp),
    }
    out = json.dumps(report, default=str)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
