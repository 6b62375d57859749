"""Memory-bounded-executor probe: the full point-in-time pipeline on
the staged 2M-image corpus at local[32] with the JVM heap cut 8x
(48g -> 6g, i.e. <200 MB per concurrent task — the shape of a real
4-8 GB multi-core executor) — interleaved big/small/big/small in
separate sessions, best wall per config.

What it evidences (VERDICT r2 Next #9 alternative): the plan does not
depend on the whole working set fitting in executor memory — Arrow
batches are bounded (2048 rows), the scan-fused reader streams blobs
through Python without JVM materialization, shuffles spill — so a
memory-per-core budget 8x tighter costs only the reported ratio, and
feature selection is IDENTICAL.  This is the property that transfers
to 1000 small executors at 10^12 rows, where per-task memory is the
binding constraint; a plan that only works with a 48 GB heap would be
disqualified regardless of its wall.

Usage: python tools/scaling_membound.py   (needs the staged 2M corpus)
Appends the result under "membound_2m" in BENCH_SCALING.json.
ONLY run on an idle machine.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time, json
os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[v] = "1"
sys.path.insert(0, {repo!r})
mem = sys.argv[1]; corpus = sys.argv[2]
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
         .config("spark.python.unix.domain.socket.enabled", "true")
         .config("spark.driver.memory", mem)
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from hiselspark.pipeline import select_features_pointintime
from hiselspark.operators.chunked import release_chunk_caches
def load(which):
    lbl = (spark.read.parquet(f"{{corpus}}/{{which}}labels")
           .withColumn("label_ts", F.col("label_ts").cast("timestamp")))
    return f"{{corpus}}/{{which}}images", lbl
pi, pl = load("pilot_")
select_features_pointintime(pi, pl, number_of_features=4,
                            minibatch_size=200, mode="scale")
release_chunk_caches()
images, labels = load("")
walls = []
for _ in range(2):
    t0 = time.perf_counter()
    res = select_features_pointintime(images, labels,
                                      number_of_features=4,
                                      minibatch_size=200, mode="scale")
    walls.append(time.perf_counter() - t0)
    release_chunk_caches()
print(json.dumps({{"driver_memory": mem, "wall_sec": min(walls),
                   "walls": walls, "rows_used": res.n_rows_used,
                   "selected": res.features}}))
"""


def child(mem: str, corpus: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO), mem, corpus],
        capture_output=True, text=True, cwd=REPO, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    corpus = "/tmp/hiselspark_scaling_corpus_2000000"
    if not os.path.exists(f"{corpus}/labels"):
        raise SystemExit("staged 2M corpus missing — run "
                         "tools/scaling_2m.py first")
    runs = {"48g": [], "6g": []}
    for mem in ("48g", "6g", "48g", "6g"):
        r = child(mem, corpus)
        runs[mem].append(r)
        print(json.dumps(r), flush=True)
    best = {m: min(rs, key=lambda r: r["wall_sec"])
            for m, rs in runs.items()}
    section = {
        "protocol": "full 2M-image pipeline, local[32], JVM heap 48g vs "
                    "6g (<200MB per concurrent task), interleaved "
                    "sessions (best of 2 sessions x 2 in-session reps)",
        "heap_48g": best["48g"],
        "heap_6g": best["6g"],
        "small_over_big_wall": round(
            best["6g"]["wall_sec"] / best["48g"]["wall_sec"], 3),
        "selection_identical":
            best["6g"]["selected"] == best["48g"]["selected"],
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    bs_path = os.path.join(REPO, "BENCH_SCALING.json")
    with open(bs_path) as f:
        bs = json.load(f)
    bs["membound_2m"] = section
    with open(bs_path, "w") as f:
        json.dump(bs, f, indent=1)
    print(json.dumps(section))
    print(f"recorded under 'membound_2m' in {bs_path}")


if __name__ == "__main__":
    main()
