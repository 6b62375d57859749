"""haar_energy / modularity / k-anonymity / streaming Holt vs
brute-force references."""
import datetime as dt
import math

import numpy as np
import pytest

from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1)


def _mk_series(spark, vals):
    rows = [("u", BASE + dt.timedelta(minutes=i), i, int(v))
            for i, v in enumerate(vals)]
    return spark.createDataFrame(
        rows, "e string, ts timestamp, o long, v long")


def _haar_brute(vals, levels=3):
    blk = 1 << levels
    n_used = (len(vals) // blk) * blk
    cur = list(vals[:n_used])
    energies = []
    for _ in range(levels):
        s = [cur[2 * i] + cur[2 * i + 1] for i in range(len(cur) // 2)]
        d = [cur[2 * i] - cur[2 * i + 1] for i in range(len(cur) // 2)]
        energies.append(sum(x * x for x in d))
        cur = s
    return n_used, energies


def test_haar_brute(spark):
    rng = np.random.default_rng(61)
    vals = rng.integers(0, 500, 45).tolist()  # 45 -> n_used 40
    from hiselspark.operators.tsprofile import haar_energy
    out = haar_energy(_mk_series(spark, vals),
                      "e", "ts", "o", "v").collect()[0]
    n_used, (e1, e2, e3) = _haar_brute(vals)
    assert out["n_used"] == n_used == 40
    assert (out["e1"], out["e2"], out["e3"]) == (e1, e2, e3)


def test_haar_constant_series_zero_energy(spark):
    from hiselspark.operators.tsprofile import haar_energy
    out = haar_energy(_mk_series(spark, [9] * 16),
                      "e", "ts", "o", "v").collect()[0]
    assert (out["e1"], out["e2"], out["e3"]) == (0, 0, 0)


def test_haar_level_separation(spark):
    # fast alternation -> all energy at level 1;
    # slow blocks of 4 -> energy at level 3 only
    fast = [100, 0] * 16
    from hiselspark.operators.tsprofile import haar_energy
    r = haar_energy(_mk_series(spark, fast),
                    "e", "ts", "o", "v").collect()[0]
    assert r["e1"] > 0 and r["e2"] == 0 and r["e3"] == 0
    slow = ([100] * 4 + [0] * 4) * 4
    r2 = haar_energy(_mk_series(spark, slow),
                     "e", "ts", "o", "v").collect()[0]
    assert r2["e1"] == 0 and r2["e2"] == 0 and r2["e3"] > 0


def test_modularity_planted_communities(spark):
    # two dense cliques joined by one bridge edge
    edges = []
    for base in (0, 100):
        for i in range(6):
            for j in range(i + 1, 6):
                edges.append((base + i, base + j))
    edges.append((0, 100))
    df = spark.createDataFrame(edges, "src long, dst long")
    from hiselspark.operators.graph import modularity
    good = spark.createDataFrame(
        [(n, n // 100) for n in list(range(6)) + list(range(100, 106))],
        "node long, community long")
    q_good = modularity(df, good).collect()[0]
    # brute: m=31, intra per community=15, deg per community: clique
    # degrees 2*15 + bridge 1 = 31 each
    m = 31
    q_expect = 2 * (15 / m - (31 / (2 * m)) ** 2)
    assert q_good["q"] == pytest.approx(q_expect, rel=1e-12)
    assert q_good["q"] > 0.4
    bad = spark.createDataFrame(
        [(n, n % 2) for n in list(range(6)) + list(range(100, 106))],
        "node long, community long")
    q_bad = modularity(df, bad).collect()[0]
    assert q_bad["q"] < q_good["q"]


def test_k_anonymity_and_l_diversity(spark):
    rows = ([("a", 1, "x")] * 10 + [("a", 2, "y")] * 3
            + [("b", 1, "x")] * 2 + [("b", 1, "y")] * 2)
    df = spark.createDataFrame(rows, "qa string, qb long, s string")
    from hiselspark.operators.pii import k_anonymity, l_diversity
    ka = {(r["qa"], r["qb"]): r for r in
          k_anonymity(df, ["qa", "qb"], k=5).collect()}
    assert ka[("a", 1)]["class_size"] == 10
    assert ka[("a", 1)]["violates_k"] is False
    assert ka[("a", 2)]["violates_k"] is True
    assert ka[("b", 1)]["violates_k"] is True
    ld = {(r["qa"], r["qb"]): r for r in
          l_diversity(df, ["qa", "qb"], "s", l=2).collect()}
    assert ld[("a", 1)]["n_sensitive"] == 1
    assert ld[("a", 1)]["violates_l"] is True  # homogeneous class
    assert ld[("b", 1)]["violates_l"] is False


def test_stream_holt_equals_batch(spark, tmp_path):
    """AvailableNow-drained stream_holt == the batch fold, replayed
    across TWO micro-batch files to exercise the state carry."""
    import pandas as pd
    rng = np.random.default_rng(67)
    rows = []
    for i in range(60):
        rows.append((i, BASE + dt.timedelta(minutes=i),
                     int(i % 3), int(rng.integers(0, 500))))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "cents"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # Spark-readable
    src = tmp_path / "src"
    src.mkdir()
    pdf.iloc[:30].to_parquet(src / "part-0.parquet", index=False)
    pdf.iloc[30:].to_parquet(src / "part-1.parquet", index=False)
    schema = spark.read.parquet(str(src)).schema
    from hiselspark.streaming.sessions import run_stream_to_batch
    from hiselspark.streaming.stateful import stream_holt
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    out = run_stream_to_batch(
        stream_holt(stream, "user_id", "ts", "cents", "event_id"),
        output_mode="update")
    from pyspark.sql import Window
    w = Window.partitionBy("entity").orderBy(F.col("n_events").desc())
    fin = {r["entity"]: r for r in
           (out.withColumn("rk", F.row_number().over(w))
               .filter(F.col("rk") == 1).collect())}
    for u in (0, 1, 2):
        seq = pdf[pdf.user_id == u].sort_values(["ts", "event_id"])
        vals = seq.cents.astype(float).tolist()
        l, b = vals[0], 0.0
        for x in vals[1:]:
            nl = 0.5 * x + 0.5 * (l + b)
            b = 0.5 * (nl - l) + 0.5 * b
            l = nl
        assert fin[u]["n_events"] == len(vals)
        assert fin[u]["level"] == pytest.approx(l, rel=1e-12)
        assert fin[u]["trend"] == pytest.approx(b, rel=1e-12)


def test_grid_cluster_planted(spark):
    rng = np.random.default_rng(83)
    # two tight blobs far apart + scattered noise
    blob1 = rng.normal(0.0, 0.01, (40, 2)) + [0.2, 0.2]
    blob2 = rng.normal(0.0, 0.01, (40, 2)) + [-0.3, -0.3]
    noise = np.array([[0.9, -0.9], [-0.9, 0.9], [0.5, 0.9]])
    pts = np.vstack([blob1, blob2, noise])
    rows = [(i, [float(x), float(y)] + [0.0] * 62)
            for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from hiselspark.operators.similarity import grid_cluster
    out = {r["id"]: r for r in
           grid_cluster(df, "vec_id", "embedding", cell_scale=16,
                        min_pts=3).collect()}
    c1 = {out[i]["cluster"] for i in range(40)}
    c2 = {out[i]["cluster"] for i in range(40, 80)}
    assert None not in c1 and None not in c2
    assert len(c1) == 1 and len(c2) == 1 and c1 != c2
    for i in range(80, 83):
        assert out[i]["cluster"] is None and out[i]["is_core"] is False


def test_grid_cluster_bridges_adjacent_cells(spark):
    # points straddling a cell boundary merge through 8-adjacency
    rows = []
    for i in range(6):
        rows.append((i, [0.061 + 0.0001 * i, 0.01] + [0.0] * 62))
    for i in range(6, 12):
        rows.append((i, [0.064 + 0.0001 * i, 0.01] + [0.0] * 62))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from hiselspark.operators.similarity import grid_cluster
    out = grid_cluster(df, "vec_id", "embedding", cell_scale=16,
                       min_pts=3).collect()
    clusters = {r["cluster"] for r in out}
    assert len(clusters) == 1 and None not in clusters


def test_classical_decompose_identity_and_planted(spark):
    rng = np.random.default_rng(89)
    rows = []
    for i in range(96):
        ts = BASE + dt.timedelta(hours=i)
        seasonal = 50 if (i % 24) in (9, 10, 11) else 0
        v = 100 + seasonal + int(rng.integers(-3, 4))
        rows.append(("u", ts, i, v))
    df = spark.createDataFrame(
        rows, "e string, ts timestamp, o long, v long")
    from hiselspark.operators.tsprofile import classical_decompose
    out = classical_decompose(df, "e", "ts", "o", "v").collect()
    vals = {r["order_id"]: r for r in out}
    # identity: v = seasonal + trend + resid - grand (rearranged)
    import statistics
    grand = statistics.mean(r[3] for r in rows)
    for i in (20, 50, 70):
        r = vals[i]
        assert r["v"] == pytest.approx(
            r["seasonal"] + r["trend"] + r["resid"] - grand, abs=1e-9)
    # planted morning seasonality is recovered
    morning = [vals[i]["seasonal"] for i in range(96) if i % 24 == 10]
    night = [vals[i]["seasonal"] for i in range(96) if i % 24 == 2]
    assert min(morning) > max(night) + 30


def test_modularity_rejects_partial_assignment(spark):
    import pytest as _pytest
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    partial = spark.createDataFrame([(0, 0), (1, 0)],
                                    "node long, community long")
    from hiselspark.operators.graph import modularity
    with _pytest.raises(ValueError, match="endpoint missing"):
        modularity(edges, partial).collect()
