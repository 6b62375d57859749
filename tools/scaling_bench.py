"""Scaling-efficiency evidence: run the SAME north pipeline on the SAME
input at two parallelism levels (local[8] vs local[32] — the sandbox
stand-in for N vs 4N executors per the driver instruction) and report
throughput at both plus efficiency = (rows/sec @32) / (4 x rows/sec @8).

Writes BENCH_SCALING.json and prints a summary.  Pass criterion
(north rule): efficiency >= 0.8.

Usage: python tools/scaling_bench.py [n_images]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
# one BLAS thread per Python worker — Spark tasks are the parallelism
for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(v, "1")
from pyspark.sql import SparkSession
cpus = int(sys.argv[1]); n_images = int(sys.argv[2])
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from hiselspark import datagen
from hiselspark.pipeline import select_features_pointintime
images = datagen.images(spark, n_images, seed=42, partitions=cpus)
labels = datagen.labels(spark, n_images, n_labels=n_images // 4, seed=42,
                        partitions=max(cpus // 4, 1))
# warm up JVM + Arrow once
images.limit(100).count()
t0 = time.perf_counter()
res = select_features_pointintime(images, labels, number_of_features=4,
                                  minibatch_size=200, mode="scale")
wall = time.perf_counter() - t0
print(json.dumps({{"cpus": cpus, "wall_sec": wall,
                   "rows_used": res.n_rows_used,
                   "rows_per_sec": res.n_rows_used / wall,
                   "selected": res.features}}))
"""


def run(cpus: int, n_images: int) -> dict:
    code = CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n_images)],
        capture_output=True, text=True, cwd=REPO, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    r8 = run(8, n_images)
    r32 = run(32, n_images)
    eff = r32["rows_per_sec"] / (4.0 * r8["rows_per_sec"])
    result = {
        "protocol": "same job, same input, local[8] vs local[32] "
                    "(sandbox stand-in for N vs 4N executors)",
        "n_images": n_images,
        "local8": r8,
        "local32": r32,
        "scaling_efficiency": round(eff, 3),
        "pass_north_rule_0.8": eff >= 0.8,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
