"""spark-submit entry point for the corpus-curation pipeline.

Usage (cluster)::

    zip -r engine.zip hiselspark/
    spark-submit --py-files engine.zip jobs/run_curate.py \
        --docs /warehouse/documents --output /warehouse/curated_run1 \
        --group-col source --token-budget 1000000 \
        --seq-len 2048 --n-shards 64

Runs scrub → quality filter → exact dedup → (optional) per-group
token budget → sequence packing (:func:`hiselspark.curation.
curate_corpus`), then writes three deterministic artifacts under
``--output``:

* ``shards/``   — the surviving documents as content-keyed,
  size-bounded training shards (:mod:`hiselspark.sinks`);
* ``segments/`` — the packing segment table (which span of which doc
  fills which slot of which sequence);
* ``manifest/`` + ``lineage.json`` — per-sequence roll-up and run
  summary (row/token counts per stage), the record a resume or audit
  reads first.

Every stage is content-keyed and layout-independent, so re-running
the job over the same input reproduces the same artifacts bit-for-bit
— which is what makes blind re-submission after a cluster failure
safe.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--docs", required=True,
                   help="documents parquet path (doc_id, text, ...)")
    p.add_argument("--output", required=True, help="run workdir")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--max-top1-frac", type=float, default=0.5)
    p.add_argument("--group-col", default=None)
    p.add_argument("--token-budget", type=int, default=None)
    p.add_argument("--seq-len", type=int, default=1024)
    p.add_argument("--n-streams", type=int, default=16)
    p.add_argument("--n-shards", type=int, default=16)
    p.add_argument("--max-records-per-file", type=int, default=None)
    p.add_argument("--salt", type=int, default=0)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from pyspark.sql import SparkSession, functions as F

    from hiselspark.curation import curate_corpus
    from hiselspark.functions.text import token_count
    from hiselspark.sinks import write_training_shards

    spark = (SparkSession.builder.appName("hiselspark-curate")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    docs = spark.read.parquet(args.docs)
    n_in = docs.count()
    res = curate_corpus(
        docs, text_col=args.text_col, id_col=args.id_col,
        min_tokens=args.min_tokens, max_top1_frac=args.max_top1_frac,
        group_col=args.group_col, token_budget=args.token_budget,
        seq_len=args.seq_len, n_streams=args.n_streams,
        salt=args.salt)
    out = args.output.rstrip("/")
    shard_manifest = write_training_shards(
        res.docs, f"{out}/shards", text_col=args.text_col,
        n_shards=args.n_shards, salt=args.salt,
        max_records_per_file=args.max_records_per_file)
    res.segments.write.mode("overwrite").parquet(f"{out}/segments")
    res.manifest.write.mode("overwrite").parquet(f"{out}/manifest")
    kept = spark.read.parquet(f"{out}/shards")
    stats = kept.agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(args.text_col)).alias("n_tokens")).collect()[0]
    man = spark.read.parquet(f"{out}/manifest")
    lineage = {
        "input": args.docs,
        "n_docs_in": n_in,
        "n_docs_kept": stats.n_docs,
        "n_tokens_kept": int(stats.n_tokens or 0),
        "n_sequences": man.count(),
        "shards": {int(r["shard"]): int(r["n_rows"])
                   for r in shard_manifest.collect()},
        "params": {k: v for k, v in vars(args).items()},
    }
    with open(f"{out}/lineage.json", "w") as f:
        json.dump(lineage, f, indent=2, sort_keys=True)
    print(json.dumps(lineage, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
