"""Input-size scaling point at arbitrary N: the full point-in-time
pipeline on an N-image staged corpus at local[8] vs local[32],
interleaved 8/32/8/32 (two pairings, best wall per config) — the same
protocol as tools/scaling_2m.py, generalized so the efficiency-vs-
input-size trend (500k -> 2M -> 8M -> ...) can be extended.

Writes ``n_images_{N}_run`` into BENCH_SCALING.json and refreshes the
``scale_trend`` section with every recorded size.

Usage: python tools/scaling_nx.py [n_images=8000000]
ONLY run on an idle machine.
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from scaling_bench import STAGE              # noqa: E402
from scaling_2m import CHILD, child          # noqa: E402  (same protocol)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    corpus = f"/tmp/hiselspark_scaling_corpus_{n}"
    if not os.path.exists(f"{corpus}/labels"):
        print(f"staging {n}-image corpus ...", flush=True)
        subprocess.run(
            [sys.executable, "-c", STAGE.format(repo=REPO), str(n), corpus],
            cwd=REPO, check=True, capture_output=True, text=True)
    runs = {8: [], 32: []}
    for cpus in (8, 32, 8, 32):
        r = child(cpus, corpus)
        runs[cpus].append(r)
        print(json.dumps(r), flush=True)
    best = {c: min(rs, key=lambda r: r["wall_sec"])
            for c, rs in runs.items()}
    eff = best[32]["rows_per_sec"] / (4.0 * best[8]["rows_per_sec"])
    section = {
        "protocol": f"same pipeline, {n}-image corpus, interleaved "
                    "local[8]/local[32] runs (best per config of 2 "
                    "sessions x 2 in-session reps, decorrelating host "
                    "drift)",
        "local8": best[8],
        "local32": best[32],
        "scaling_efficiency": round(eff, 3),
        "wall32_lt_wall8": best[32]["wall_sec"] < best[8]["wall_sec"],
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    path = os.path.join(REPO, "BENCH_SCALING.json")
    data = json.load(open(path))
    data[f"n_images_{n}_run"] = section
    trend = {"raw_efficiency_500k": data.get("scaling_efficiency"),
             "raw_efficiency_2m": data.get("n_images_2m_run", {})
                                      .get("scaling_efficiency")}
    for key, sec in data.items():
        m = re.fullmatch(r"n_images_(\d+)_run", key)
        if m:
            trend[f"raw_efficiency_{m.group(1)}"] = \
                sec.get("scaling_efficiency")
    trend["note"] = ("raw efficiency rising with input size = the "
                     "fixed scheduling/stage cost amortizes; an N->4N "
                     "cluster at the 10^12 target sees the asymptote, "
                     "not the 500k point")
    data["scale_trend"] = trend
    json.dump(data, open(path, "w"), indent=2)
    print(json.dumps(section, indent=2))


if __name__ == "__main__":
    main()
