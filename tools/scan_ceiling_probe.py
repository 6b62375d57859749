"""Hardware-ceiling probe for the SCAN stage specifically: the same
work the fused scan does per row group — pyarrow read + image decode +
pixel statistics + caption features — run under bare multiprocessing
(no Spark, no JVM, no scheduler) at 8 vs 32 processes on the staged
corpus.

Purpose: separate "Spark overhead" from "this box" in the scan stage's
measured scaling.  If bare process-parallel decode also reaches ~2x
from 8 -> 32 workers, the limit is the box's shared memory bus /
page-cache bandwidth, not the engine — the number to report as the
stage's hardware ceiling next to its Spark-measured efficiency.

Usage: python tools/scan_ceiling_probe.py [n_images=500000]
Writes ``scan_ceiling_probe`` into BENCH_SCALING.json.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")


def work_item(args):
    """One (file, row_group): exactly the fused scan's per-item body."""
    file, rg = args
    import pyarrow.parquet as pq

    from hiselspark.functions.image import _pixel_stats_frame
    from hiselspark.sources.fused_scan import (_SOURCE_COLS,
                                               _caption_features_pandas)

    pf = pq.ParquetFile(file)
    n = 0
    for rb in pf.iter_batches(batch_size=1024, row_groups=[int(rg)],
                              columns=_SOURCE_COLS):
        batch = rb.to_pandas()
        batch["phash"] = batch["phash"].astype("int64")
        out = _pixel_stats_frame(batch)
        out = _caption_features_pandas(out)
        n += len(out)
    return n


def run(nproc: int, items) -> float:
    t0 = time.perf_counter()
    with mp.get_context("spawn").Pool(nproc) as pool:
        total = sum(pool.map(work_item, items, chunksize=1))
    wall = time.perf_counter() - t0
    return wall, total


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    corpus = f"/tmp/hiselspark_scaling_corpus_{n}/images"
    from hiselspark.sources.fused_scan import list_row_groups
    items = [tuple(r) for r in list_row_groups(corpus).itertuples(
        index=False)]
    print(f"{len(items)} row groups")
    results = {8: [], 32: []}
    run(32, items[: max(len(items) // 16, 1)])  # page-cache warm
    for nproc in (8, 32, 8, 32):
        wall, total = run(nproc, items)
        results[nproc].append(wall)
        print(json.dumps({"nproc": nproc, "wall_sec": wall,
                          "rows": total}))
    best8, best32 = min(results[8]), min(results[32])
    section = {
        "protocol": ("bare multiprocessing.Pool over the SAME "
                     "(file, row-group) items and per-item body as the "
                     "fused scan — no Spark; interleaved 8/32/8/32, "
                     "best per config; page cache pre-warmed"),
        "n_images": n,
        "wall8_sec": round(best8, 2),
        "wall32_sec": round(best32, 2),
        "all_walls8_sec": [round(w, 2) for w in sorted(results[8])],
        "all_walls32_sec": [round(w, 2) for w in sorted(results[32])],
        "ceiling_8_to_32": round(best8 / best32 / 4.0, 3),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    path = os.path.join(REPO, "BENCH_SCALING.json")
    data = json.load(open(path))
    data[f"scan_ceiling_probe_{n}"] = section
    json.dump(data, open(path, "w"), indent=2)
    print(json.dumps(section, indent=2))


if __name__ == "__main__":
    main()
