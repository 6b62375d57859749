"""Round-5 regression tests for the round-4 ADVICE items:

* burrows_delta keeps zero-token documents with NULL delta;
* hurst_rs keeps entities shorter than the smallest block size with
  zeroed counts and NULL hurst;
* spiegelhalter_z / brier_skill accumulate past the old int64 wrap
  bounds (DECIMAL(38,0) sums/products) and spiegelhalter's b_den
  NULLs rather than wraps beyond int64;
* the streaming-source staging symlink is recreated unconditionally
  so a regenerated dataset directory can never leave it dangling.
"""
import math
import os

import pytest
from pyspark.sql import functions as F


def test_burrows_delta_keeps_empty_docs(spark):
    from hiselspark.functions.text import burrows_delta
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha gamma"),
         (2, "alpha beta beta delta"),
         (3, "gamma gamma alpha beta"),
         (4, ""),          # zero tokens after the whitespace filter
         (5, "   ")],      # whitespace-only -> zero tokens too
        "doc_id int, text string")
    out = {r["doc_id"]: r for r in
           burrows_delta(docs, "doc_id", "text", top_v=3).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    for d in (4, 5):
        assert out[d]["n_tokens"] == 0
        assert out[d]["delta"] is None
    for d in (1, 2, 3):
        assert out[d]["n_tokens"] == 4
        assert out[d]["delta"] is not None


def test_hurst_rs_keeps_short_entities(spark):
    from hiselspark.operators.tsprofile import hurst_rs
    rows = [("long", i, i, (i * 37 + 11) % 97) for i in range(40)]
    rows += [("short", i, i, i) for i in range(5)]  # < smallest size 8
    df = spark.createDataFrame(
        rows, "entity string, ts long, o long, v long")
    out = {r["entity"]: r for r in
           hurst_rs(df, "entity", "ts", "o", "v",
                    sizes=(8, 16)).collect()}
    assert set(out) == {"long", "short"}
    s = out["short"]
    assert (s["n"], s["n_sizes"], s["n_blocks"], s["n_deg_blocks"]) \
        == (5, 0, 0, 0)
    assert s["hurst"] is None
    lg = out["long"]
    assert lg["n"] == 40 and lg["n_blocks"] > 0


def test_spiegelhalter_decimal_sum_and_b_den_rail(spark):
    from hiselspark.operators.evaluate import spiegelhalter_z
    # pm=500,y=1 per row: a_t=0, b_t=0 -> exercise nonzero terms
    # pm=100: a_t=(1000y-100)*800, b_t=800^2*100*900=5.76e10/row
    df = spark.createDataFrame(
        [(100, 1)] * 200 + [(900, 0)] * 200, "pm int, y int")
    row = spiegelhalter_z(df, "pm", "y").collect()[0]
    # exact closed form: 400 rows, symmetric
    a = 200 * (900 * 800) + 200 * ((-900) * (-800))
    b = 400 * (800 * 800 * 100 * 900)
    assert row["a_num"] == a and row["b_den"] == b
    assert row["z"] == pytest.approx(a / math.sqrt(b))
    # b_den NULL rail: decimal sum exceeding int64 must not wrap.
    # Simulate with a pm column whose per-row b term is maximal and
    # enough duplicated rows via explode to cross 2^63 cheaply?  That
    # needs ~3.7e7 rows - too slow for a unit test; instead verify the
    # rail expression directly on a crafted aggregate.
    from pyspark.sql import Row
    dec = "decimal(38,0)"
    big = spark.createDataFrame([Row(b="9300000000000000000000")]) \
        .select(F.col("b").cast(dec).alias("b"))
    railed = big.select(
        F.when(F.col("b") <= F.lit(2 ** 63 - 1).cast(dec),
               F.col("b").cast("long")).alias("b_long")).collect()[0]
    assert railed["b_long"] is None


def test_brier_skill_decimal_product(spark):
    from hiselspark.operators.evaluate import brier_skill
    df = spark.createDataFrame(
        [(700, 1)] * 30 + [(300, 0)] * 10, "pm int, y int")
    row = brier_skill(df, "pm", "y").collect()[0]
    n, k = 40, 30
    a = 30 * 300 ** 2 + 10 * 300 ** 2
    assert (row["n"], row["k"], row["a_num"]) == (n, k, a)
    assert row["bss"] == pytest.approx(
        1.0 - (a * n) / (1_000_000 * k * (n - k)))


def test_stage_link_replaces_stale_symlink(tmp_path):
    import __spark_entry__ as se
    src_dir = tmp_path / "stage"
    src_dir.mkdir()
    old_target = tmp_path / "old.parquet"
    new_target = tmp_path / "new.parquet"
    old_target.write_bytes(b"old")
    new_target.write_bytes(b"new")
    link = se._stage_link(str(src_dir), "events.parquet",
                          str(old_target))
    assert os.readlink(link) == str(old_target)
    # dataset regenerated under a NEW path: the old exists-check kept
    # the stale link; _stage_link must repoint it atomically
    old_target.unlink()  # now the first link dangles
    link2 = se._stage_link(str(src_dir), "events.parquet",
                           str(new_target))
    assert link2 == link
    assert os.readlink(link) == str(new_target)
    assert open(link, "rb").read() == b"new"
    # no temp droppings left behind
    assert sorted(os.listdir(src_dir)) == ["events.parquet"]


def test_bradley_terry_driver_path_equals_distributed(spark):
    """The round-5 driver fixed-point path (pair table under the cap)
    must be BIT-IDENTICAL to the distributed MM rounds — identical
    int64 formulas, just without the per-round job scheduling."""
    from hiselspark.operators.rank_eval import bradley_terry
    rows = []
    for a, b, na, nb in (("x", "y", 7, 3), ("y", "z", 5, 4),
                         ("x", "z", 2, 6), ("w", "x", 3, 3)):
        rows += [(a, b)] * na + [(b, a)] * nb
    df = spark.createDataFrame(rows, "w string, l string")
    fast = {r["player"]: r for r in
            bradley_terry(df, "w", "l").collect()}
    slow = {r["player"]: r for r in
            bradley_terry(df, "w", "l", driver_pair_cap=0).collect()}
    assert set(fast) == set(slow) == {"w", "x", "y", "z"}
    for p in fast:
        assert (fast[p]["rating"], fast[p]["wins"], fast[p]["games"]) \
            == (slow[p]["rating"], slow[p]["wins"], slow[p]["games"])


def test_hard_negative_pairs_planted_clusters(spark):
    """Planted two-cluster geometry: positives come from the anchor's
    own cluster, hard negatives from the other; margins positive."""
    import numpy as np
    rng = np.random.default_rng(5)
    rows = []
    for i in range(40):
        lab = i % 2
        center = np.zeros(8)
        center[lab] = 1.0
        v = center + 0.05 * rng.standard_normal(8)
        rows.append((i, [float(x) for x in v], lab))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    out = __import__("hiselspark.operators.similarity",
                     fromlist=["hard_negative_pairs"]) \
        .hard_negative_pairs(df.filter("vec_id < 6"), df,
                             k_cand=25, n_neg=2).collect()
    assert len(out) == 12        # 6 anchors x 2 negatives
    for r in out:
        assert r["pos_id"] % 2 == r["anchor_id"] % 2
        assert r["neg_id"] % 2 != r["anchor_id"] % 2
        assert r["margin"] > 0


def test_stream_winnow_df_equals_batch(spark, tmp_path):
    """Drained incremental fingerprint-DF table == batch winnowing DF
    (the streaming substring-dedup dictionary twin)."""
    import pandas as pd
    from hiselspark.operators.dedup import winnowing_fingerprints
    from hiselspark.streaming.dedup import stream_winnow_df
    from hiselspark.streaming.sessions import (read_events_stream,
                                               run_stream_to_batch)
    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "a completely different sentence with no overlap x"),
            (4, "the quick brown fox jumps over the lazy dog")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = tmp_path / "docs"
    src.mkdir()
    docs.toPandas().to_parquet(str(src / "docs.parquet"))
    stream = read_events_stream(spark, str(src), docs.schema)
    got = (run_stream_to_batch(
        stream_winnow_df(stream, "doc_id", "text", k=8, window=4),
        output_mode="complete").toPandas()
        .sort_values("fingerprint").reset_index(drop=True))
    exp = (winnowing_fingerprints(docs, "doc_id", "text", k=8,
                                  window=4)
           .groupBy("fingerprint")
           .agg({"*": "count"}).withColumnRenamed("count(1)",
                                                  "doc_freq")
           .toPandas().sort_values("fingerprint")
           .reset_index(drop=True))
    assert got.astype("int64").equals(exp.astype("int64"))
    # the duplicated-fingerprint dictionary sees the shared prefix
    shared = got[got["doc_freq"] >= 2]
    assert len(shared) > 0
