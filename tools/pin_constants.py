"""Pin the small engine-side CONSTANTS of the approximate-search gate
queries — candidate id sets and fitted model parameters — so that
``oracle_sql()`` can rebuild every reported VALUE independently in
DuckDB from the parquet tables.

This is the second half of retiring the full literal-table pins
(``tools/pin_oracles.py``): for LSH/IVF/PQ top-k the *candidate set*
is genuinely engine-specific (it encodes the bucketing/quantizer), but
every similarity value reported for those candidates is recomputable
from the raw vectors.  So we pin only
  * the (probe_id, rk, vec_id[, adc_sim]) picks per ANN query,
  * the k-means cluster assignment of ``semantic_dedup``,
  * the PCA model (mean + components) of ``pca_project``,
and the oracle SQL replays the cosine / projection / leader-scan
arithmetic from the parquet.  A regression in the engine's math then
breaks the gate even though the candidate ids are pinned; a regression
in the bucketing changes the ids and breaks it too.

Each constant is extracted twice under different parallelism and must
be bit-identical (layout-determinism check, same as pin_oracles).

Usage: python tools/pin_constants.py [sf_dir]
"""
from __future__ import annotations

import os
import sys

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "hiselspark", "pinned_constants.py")


def extract(spark, sf_dir: str) -> dict:
    import __spark_entry__ as se
    from pyspark.sql import functions as F
    qs = se.queries()
    consts: dict = {}

    for name in ("lsh_topk", "ivf_topk"):
        pdf = (qs[name](spark, sf_dir)
               .select("probe_id", "rk", "vec_id")
               .toPandas().sort_values(["probe_id", "rk"])
               .reset_index(drop=True))
        consts[f"{name}_ids"] = [
            (int(a), int(b), int(c))
            for a, b, c in pdf.itertuples(index=False, name=None)]

    # pin the GATE query's output so the pinned config (m/n_codes/
    # refine) can never drift from what the gate actually runs
    pq = (qs["pq_topk"](spark, sf_dir)
          .select("probe_id", "rk", "vec_id", "adc_sim")
          .toPandas().sort_values(["probe_id", "rk"])
          .reset_index(drop=True))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    consts["pq_topk_ids"] = [
        (int(r.probe_id), int(r.rk), int(r.vec_id), float(r.adc_sim))
        for r in pq.itertuples(index=False)]

    from hiselspark.operators.similarity import semantic_dedup
    sd = (semantic_dedup(emb, dim=64, n_clusters=8, eps=0.65, seed=11)
          .select("vec_id", "cluster").toPandas()
          .sort_values("vec_id").reset_index(drop=True))
    consts["semantic_dedup_clusters"] = [
        (int(a), int(b)) for a, b in sd.itertuples(index=False, name=None)]

    # selection-family constant pins (round 4, demoted from full
    # literal pins): exact unrounded scores + the LARS pick; the
    # oracle derives rounding and score-ranking in SQL
    consts["hsic_emb_scores"] = [
        (c, float(s), bool(sel))
        for c, s, _rank, sel in se._hsic_emb_rows(spark, sf_dir)]
    consts["segmented_select"] = [
        (int(seg), int(rk), str(feat), float(s))
        for seg, rk, feat, s in se._segmented_select_rows(spark, sf_dir)]

    from hiselspark.operators.projection import pca_fit
    model = pca_fit(emb, "embedding", k=4)
    consts["pca_model"] = {
        "mean": [float(x) for x in model.mean],
        "components": [[float(x) for x in row]
                       for row in model.components],
    }
    return consts


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    from pyspark.sql import SparkSession

    def session(cores: int, shuffle: int):
        spark = (SparkSession.builder.master(f"local[{cores}]")
                 .config("spark.sql.shuffle.partitions", str(shuffle))
                 .config("spark.sql.session.timeZone", "UTC")
                 .config("spark.ui.enabled", "false")
                 .config("spark.driver.memory", "16g")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        return spark

    s1 = session(8, 8)
    first = extract(s1, sf_dir)
    s1.stop()
    s2 = session(5, 17)
    second = extract(s2, sf_dir)
    s2.stop()
    if first != second:
        for k in first:
            if first[k] != second[k]:
                raise SystemExit(f"{k} is NOT layout-deterministic")
    for k, v in first.items():
        n = len(v) if not isinstance(v, dict) else "model"
        print(f"pinning constant {k}: {n} entries "
              f"(bit-identical across layouts)")

    with open(OUT, "w") as f:
        f.write('"""Pinned engine-side constants (ANN candidate ids, '
                'k-means assignments,\nPCA model) consumed by '
                '``oracle_sql()`` to rebuild all reported values\n'
                'independently in DuckDB.  GENERATED by '
                'tools/pin_constants.py at the gate\nscale factor '
                f'({os.path.basename(sf_dir)}); regenerate after any '
                'intentional change to\nthe underlying operators.\n'
                '"""\n\nPINNED_CONSTANTS = {\n')
        for k, v in first.items():
            f.write(f'    "{k}": {v!r},\n')
        f.write("}\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
