"""lift_table / brier_decomposition / with_gopher_flags vs
brute-force references."""
import math

import numpy as np
import pytest

from pyspark.sql import functions as F


def test_lift_table_brute(spark):
    rng = np.random.default_rng(23)
    scores = rng.integers(0, 40, 500)
    labels = (rng.random(500) < (scores / 60.0)).astype(int)
    rows = [(i, int(s), int(y))
            for i, (s, y) in enumerate(zip(scores, labels))]
    df = spark.createDataFrame(rows, "id long, score long, y long")
    from hiselspark.operators.evaluate import lift_table
    out = {r["bucket"]: r for r in
           lift_table(df, "score", "y", "id", n_buckets=10).collect()}

    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    n, B = len(order), 10
    base, extra = divmod(n, B)
    buckets, pos = {}, {}
    i = 0
    for b in range(1, B + 1):
        size = base + (1 if b <= extra else 0)
        chunk = order[i:i + size]
        i += size
        buckets[b] = size
        pos[b] = sum(r[2] for r in chunk)
    tot_pos = sum(pos.values())
    cum_n = cum_pos = 0
    for b in range(1, B + 1):
        cum_n += buckets[b]
        cum_pos += pos[b]
        r = out[b]
        assert r["n"] == buckets[b] and r["pos"] == pos[b]
        assert r["cum_n"] == cum_n and r["cum_pos"] == cum_pos
        assert r["cum_capture"] == pytest.approx(cum_pos / tot_pos,
                                                 rel=1e-12)
        assert r["cum_lift"] == pytest.approx(
            (cum_pos / cum_n) / (tot_pos / n), rel=1e-12)
    # a ranker better than chance: top-decile lift > 1, monotone-ish
    assert out[1]["cum_lift"] > 1.0


def test_brier_decomposition_identity_and_brute(spark):
    rng = np.random.default_rng(29)
    ks = rng.integers(0, 101, 800)
    ys = (rng.random(800) * 100 < ks).astype(int)
    df = spark.createDataFrame(
        [(int(k), int(y)) for k, y in zip(ks, ys)], "k long, y long")
    from hiselspark.operators.evaluate import brier_decomposition
    out = brier_decomposition(df, "k", "y", denom=100).collect()[0]
    p = ks / 100.0
    bs = float(((p - ys) ** 2).mean())
    assert out["brier"] == pytest.approx(bs, rel=1e-12)
    # Murphy identity holds exactly on distinct-value binning
    assert out["rel"] - out["res"] + out["unc"] == pytest.approx(
        bs, rel=1e-9)
    # brute per-cell decomposition
    obar = ys.mean()
    rel = res = 0.0
    for k in np.unique(ks):
        m = ks == k
        ok = ys[m].mean()
        rel += m.sum() * (k / 100.0 - ok) ** 2
        res += m.sum() * (ok - obar) ** 2
    assert out["rel"] == pytest.approx(rel / len(ks), rel=1e-9)
    assert out["res"] == pytest.approx(res / len(ks), rel=1e-9)
    assert out["unc"] == pytest.approx(obar * (1 - obar), rel=1e-12)


def test_gopher_flags(spark):
    good = "the quick brown fox and the lazy dog have gone to town " \
           "with many fine words of modest length that read well " \
           "and carry meaning through every line of have and that"
    short = "too few words"
    symbols = "the " + "# " * 40 + "of and that have with be to"
    longwords = ("pneumonoultramicroscopic " * 30
                 + "the of and that have")
    rows = [(1, good), (2, short), (3, symbols), (4, longwords),
            (5, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from hiselspark.functions.text import with_gopher_flags
    out = {r["doc_id"]: r for r in
           with_gopher_flags(df, "text", min_words=20).collect()}
    assert out[1]["gopher_pass"] is True
    assert out[2]["flag_word_count"] is False
    assert out[3]["flag_symbols"] is False
    assert out[4]["flag_mean_len"] is False
    assert out[5]["n_words"] == 0 and out[5]["gopher_pass"] is False
    # exact counts on the good doc
    words = good.split()
    assert out[1]["n_words"] == len(words)
    assert out[1]["sum_word_len"] == sum(len(w) for w in words)
    stop = {"the", "be", "to", "of", "and", "that", "have", "with"}
    assert out[1]["n_stopwords"] == sum(w.lower() in stop
                                        for w in words)


def test_tpch_q4_q12_shapes(spark):
    sf = "/root/testdata/sf0.001"
    import __spark_entry__ as se
    q4 = se.q_tpch_q4(spark, sf).collect()
    assert sum(r["order_count"] for r in q4) > 0
    q12 = {r["mode"]: r for r in se.q_tpch_q12(spark, sf).collect()}
    for r in q12.values():
        assert r["high_line_count"] + r["low_line_count"] > 0


def test_gopher_symbol_ratio_exact_rational(spark):
    # max_symbol_ratio is honored as the EXACT rational from its
    # decimal literal (0.3 == 3/10), not snapped to a unit fraction
    # (1/3): 16 '#' in 50 words is 0.32 > 0.3 and must fail, while
    # 15/50 = 0.30 sits exactly on the boundary and passes
    from hiselspark.functions.text import with_gopher_flags
    base = ("word " * 34).split()
    t_just = " ".join(base + ["#"] * 16)   # 50 words, 16 symbols
    t_edge = " ".join(base + ["w"] + ["#"] * 15)  # 50 words, 15 symbols
    df = spark.createDataFrame([(1, t_just), (2, t_edge)],
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           with_gopher_flags(df, "text", min_words=10,
                             max_symbol_ratio=0.3).collect()}
    assert out[1]["n_words"] == 50 and out[1]["n_symbols"] == 16
    assert out[1]["flag_symbols"] is False
    assert out[2]["flag_symbols"] is True
