"""trigram stupid-backoff / pit_expanding_ols / uplift_deciles vs
brute references."""
import datetime as dt
import math

import numpy as np
import pytest

from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1)


def test_trigram_backoff_brute(spark):
    ref_docs = [(1, "the cat sat on the mat"),
                (2, "the dog sat on the rug"),
                (3, "a cat and a dog sat down")]
    score_docs = [(10, "the cat sat on the rug"),     # mixed seen
                  (11, "purple elephants fly quietly")]  # all unseen
    ref = spark.createDataFrame(ref_docs, "doc_id long, text string")
    sc = spark.createDataFrame(score_docs, "doc_id long, text string")
    from hiselspark.functions.text import trigram_backoff_logprob
    out = {r["doc_id"]: r for r in
           trigram_backoff_logprob(sc, ref, "doc_id").collect()}

    from collections import Counter
    rtoks = [d.split() for _, d in ref_docs]
    uni = Counter(t for ts in rtoks for t in ts)
    pair = Counter((ts[i], ts[i + 1]) for ts in rtoks
                   for i in range(len(ts) - 1))
    tri = Counter((ts[i], ts[i + 1], ts[i + 2]) for ts in rtoks
                  for i in range(len(ts) - 2))
    N = sum(uni.values())
    V = len(uni)
    a = 0.4

    def doc_score(text):
        ts = text.split()
        terms = []
        for i in range(len(ts) - 2):
            w1, w2, w3 = ts[i], ts[i + 1], ts[i + 2]
            if tri[(w1, w2, w3)] > 0:
                terms.append(math.log(tri[(w1, w2, w3)]
                                      / pair[(w1, w2)]))
            elif pair[(w2, w3)] > 0:
                terms.append(math.log(a * pair[(w2, w3)] / uni[w2]))
            else:
                terms.append(math.log(a * a * (uni[w3] + 1) / (N + V)))
        return sum(terms) / len(terms), len(terms)

    for did, text in score_docs:
        s, n = doc_score(text)
        assert out[did]["n_trigrams"] == n
        assert out[did]["trigram_logprob"] == pytest.approx(s,
                                                            rel=1e-9)
    # seen text scores higher than gibberish
    assert out[10]["trigram_logprob"] > out[11]["trigram_logprob"]


def test_pit_ols_brute_and_no_leakage(spark):
    rng = np.random.default_rng(73)
    vals = (np.arange(50) * 7 + rng.integers(-3, 4, 50)).tolist()
    rows = [("u", BASE + dt.timedelta(seconds=60 * i), i, int(v))
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "e string, ts timestamp, o long, v long")
    from hiselspark.operators.regress import pit_expanding_ols
    out = {r["order_id"]: r for r in
           pit_expanding_ols(df, "e", "ts", "o", "v").collect()}
    xs = [60 * i for i in range(50)]
    for i in range(50):
        r = out[i]
        assert r["n_prior"] == i
        if i < 2:
            assert r["slope"] is None
            continue
        px, py = np.array(xs[:i], dtype=float), \
            np.array(vals[:i], dtype=float)
        n = i
        den = n * (px * px).sum() - px.sum() ** 2
        slope = (n * (px * py).sum() - px.sum() * py.sum()) / den
        inter = (py.sum() - slope * px.sum()) / n
        assert r["slope"] == pytest.approx(slope, rel=1e-9)
        assert r["intercept"] == pytest.approx(inter, rel=1e-9)
        assert r["prediction"] == pytest.approx(inter + slope * xs[i],
                                                rel=1e-9)
    # the trend is recovered: late predictions track the ramp
    assert abs(out[49]["prediction"] - vals[49]) < 25


def test_pit_ols_prediction_ignores_future_shift(spark):
    # constant 100 then a jump to 900: the prediction AT the jump row
    # must still be ~100 (no future data in the fit)
    vals = [100] * 20 + [900] * 5
    rows = [("u", BASE + dt.timedelta(seconds=60 * i), i, v)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "e string, ts timestamp, o long, v long")
    from hiselspark.operators.regress import pit_expanding_ols
    out = {r["order_id"]: r for r in
           pit_expanding_ols(df, "e", "ts", "o", "v").collect()}
    assert out[20]["prediction"] == pytest.approx(100.0, abs=1e-6)


def test_uplift_deciles_brute(spark):
    rng = np.random.default_rng(79)
    n = 1000
    score = rng.integers(0, 50, n)
    treat = rng.integers(0, 2, n).astype(bool)
    # true uplift concentrated in high scores
    base_p = 0.2
    p = base_p + np.where(treat, score / 120.0, 0.0)
    y = (rng.random(n) < p).astype(int)
    rows = [(i, int(score[i]), bool(treat[i]), int(y[i]))
            for i in range(n)]
    df = spark.createDataFrame(rows,
                               "id long, score long, t boolean, y long")
    from hiselspark.operators.evaluate import uplift_deciles
    out = {r["bucket"]: r for r in
           uplift_deciles(df, "score", F.col("t"), "y", "id",
                          n_buckets=10).collect()}
    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    B = 10
    base, extra = divmod(n, B)
    i = 0
    for b in range(1, B + 1):
        size = base + (1 if b <= extra else 0)
        chunk = order[i:i + size]
        i += size
        nt = sum(1 for r in chunk if r[2])
        nc = size - nt
        rt = sum(r[3] for r in chunk if r[2])
        rc = sum(r[3] for r in chunk if not r[2])
        r = out[b]
        assert (r["n_t"], r["n_c"], r["resp_t"], r["resp_c"]) == \
            (nt, nc, rt, rc)
        if nt and nc:
            assert r["uplift"] == pytest.approx(rt / nt - rc / nc,
                                                rel=1e-12)
    # planted effect: top-decile uplift beats bottom-decile
    assert out[1]["uplift"] > out[10]["uplift"]
