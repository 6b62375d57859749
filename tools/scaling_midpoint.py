"""Interior scaling point: the full point-in-time pipeline on the
500k-image staged corpus at local[8] / local[16] / local[32],
interleaved 8/16/32/8/16/32 (two pairings per config, best wall) —
fills in the curve BETWEEN the N and 4N endpoints so the shape of the
single-box scaling (linear region vs bandwidth plateau) is visible,
per the round-3 review's optional suggestion.

Writes ``midpoint_16_run`` into BENCH_SCALING.json:
  eff_8_to_16  = (rows/sec @16) / (2 x rows/sec @8)
  eff_16_to_32 = (rows/sec @32) / (2 x rows/sec @16)
  eff_8_to_32  = (rows/sec @32) / (4 x rows/sec @8)

Usage: python tools/scaling_midpoint.py [n_images=500000]
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

from scaling_bench import STAGE              # noqa: E402
from scaling_2m import CHILD, child          # noqa: E402  (same protocol)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    corpus = f"/tmp/hiselspark_scaling_corpus_{n}"
    if not os.path.exists(f"{corpus}/labels"):
        print(f"staging {n}-image corpus ...", flush=True)
        subprocess.run(
            [sys.executable, "-c", STAGE.format(repo=REPO), str(n), corpus],
            cwd=REPO, check=True, capture_output=True, text=True)
    runs = {8: [], 16: [], 32: []}
    for cpus in (8, 16, 32, 8, 16, 32):
        r = child(cpus, corpus)
        runs[cpus].append(r)
        print(json.dumps(r), flush=True)
    best = {c: max(rs, key=lambda r: r["rows_per_sec"])
            for c, rs in runs.items()}
    rps = {c: best[c]["rows_per_sec"] for c in (8, 16, 32)}
    rec = {
        "protocol": "interleaved 8/16/32 x2, best wall per config; "
                    "full PIT pipeline, pilot-warmed sessions",
        "n_images": n,
        "local8": best[8], "local16": best[16], "local32": best[32],
        "walls_all": {str(c): [r["wall_sec"] for r in rs]
                      for c, rs in runs.items()},
        "eff_8_to_16": round(rps[16] / (2 * rps[8]), 3),
        "eff_16_to_32": round(rps[32] / (2 * rps[16]), 3),
        "eff_8_to_32": round(rps[32] / (4 * rps[8]), 3),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    path = os.path.join(REPO, "BENCH_SCALING.json")
    data = json.load(open(path))
    data["midpoint_16_run"] = rec
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps({"midpoint_16_run": rec}, indent=1))


if __name__ == "__main__":
    main()
