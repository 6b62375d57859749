"""Same-session interleaved A/B of the as-of join: round-1 code
(c73295c — bare (ts, side) window order) vs current code (adds the
packed value struct as a deterministic tie key).

Round 2's bench recorded asof_join 3.14 s -> 4.63 s (+48%) against
round 1, measured as SINGLE-SHOT walls on a host with documented 2-3x
load swings.  This tool closes that loop: both implementations run in
ONE session, alternating A/B/A/B..., so they see the same host load —
if the walls interleave within noise, the "regression" was the host,
not the extra sort key.

Usage: python tools/ab_asof.py [sf_dir] [reps]   (default sf0.1, 4)
Appends the result under "asof_ab" in BENCH_SCALING.json.
"""
from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")
os.environ.setdefault("PYSPARK_PYTHON", sys.executable)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

R1_COMMIT = "c73295c"


def load_r1_asof():
    src = subprocess.check_output(
        ["git", "show", f"{R1_COMMIT}:hiselspark/operators/asof.py"],
        cwd=REPO, text=True)
    path = "/tmp/asof_r1_module.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("asof_r1", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import SparkSession, functions as F
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "48g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import hiselspark.operators.asof as asof_now
    asof_r1 = load_r1_asof()

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select("event_id", "user_id", "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
                .groupBy("user_id", "ts")
                .agg(F.max("value").alias("click_value")))

    def run(mod):
        out = mod.asof_join(purchases, clicks, on="user_id",
                            left_ts="ts", right_ts="ts",
                            value_cols=["click_value"])
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # warm both plans once (codegen/JIT), then interleave timed reps
    run(asof_r1)
    run(asof_now)
    walls = {"r1": [], "now": []}
    for _ in range(reps):
        walls["r1"].append(run(asof_r1))
        walls["now"].append(run(asof_now))

    result = {
        "protocol": f"interleaved A/B x{reps}, one local[32] session, "
                    f"{os.path.basename(sf_dir)}, warm",
        "r1_commit": R1_COMMIT,
        "r1_walls": walls["r1"],
        "now_walls": walls["now"],
        "r1_best": min(walls["r1"]),
        "now_best": min(walls["now"]),
        "now_over_r1": round(min(walls["now"]) / min(walls["r1"]), 3),
    }
    print(json.dumps(result))
    bs_path = os.path.join(REPO, "BENCH_SCALING.json")
    with open(bs_path) as f:
        bs = json.load(f)
    bs["asof_ab"] = result
    with open(bs_path, "w") as f:
        json.dump(bs, f, indent=1)
    print(f"recorded under 'asof_ab' in {bs_path}")
    sys.stdout.flush()
    try:
        spark.stop()
    except Exception:
        pass
    os._exit(0)


if __name__ == "__main__":
    main()
