"""dup_spans / sprt vs brute-force Python oracles."""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest


# ---------------------------------------------------------------------------
# dup_spans
# ---------------------------------------------------------------------------

def _brute_dup_spans(texts, k, min_docs):
    from collections import defaultdict
    occ = defaultdict(set)
    for d, t in texts.items():
        for p in range(len(t) - k + 1):
            occ[t[p:p + k]].add(d)
    out = {}
    for d, t in texts.items():
        n = len(t) - k + 1
        if n <= 0:
            continue
        dup = [len(occ[t[p:p + k]]) >= min_docs for p in range(n)]
        longest = run = 0
        for f in dup:
            run = run + 1 if f else 0
            longest = max(longest, run)
        out[d] = (n, sum(dup), longest,
                  longest + k - 1 if longest else 0)
    return out


def test_dup_spans_matches_brute(spark):
    from hiselspark.operators.spans import dup_spans
    rng = np.random.default_rng(7)
    boiler = "the quick brown fox jumps over the lazy dog again"
    texts = {}
    for d in range(30):
        body = "".join(chr(97 + c) for c in rng.integers(0, 26, 60))
        # plant shared boilerplate in every third doc
        texts[d] = body + (boiler if d % 3 == 0 else "") + body[::-1]
    texts[30] = "tiny"        # shorter than k -> absent from output
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())}))
    got = {r["doc_id"]: r for r in
           dup_spans(df, "doc_id", "text", k=12, min_docs=2).collect()}
    exp = _brute_dup_spans(texts, 12, 2)
    assert set(got) == set(exp)          # doc 30 dropped in both
    for d, (n, dup, longest, span) in exp.items():
        assert got[d]["n_grams"] == n
        assert got[d]["dup_grams"] == dup
        assert got[d]["longest_run"] == longest
        assert got[d]["longest_span_chars"] == span
        assert got[d]["dup_ratio"] == pytest.approx(round(dup / n, 6))
    # the planted boilerplate must actually register as duplicated
    assert any(exp[d][1] > 0 for d in exp)


def test_dup_spans_planted_span_length(spark):
    from hiselspark.operators.spans import dup_spans
    # two docs share one exact 30-char span inside unique noise:
    # the longest fully-duplicated substring must come back as 30
    shared = "abcdefghijklmnopqrstuvwxyz0123"      # 30 chars
    a = "XXXX" + shared + "YYYYYYYYYY"
    b = "QQQQQQQ" + shared + "ZZZZ"
    df = spark.createDataFrame(
        [(0, a), (1, b)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           dup_spans(df, "doc_id", "text", k=10, min_docs=2).collect()}
    for d in (0, 1):
        assert got[d]["longest_span_chars"] == 30
        assert got[d]["longest_run"] == 30 - 10 + 1
    with pytest.raises(ValueError):
        dup_spans(df, "doc_id", "text", k=10, min_docs=1)


# ---------------------------------------------------------------------------
# sprt
# ---------------------------------------------------------------------------

def _brute_sprt(xs, p0, p1, alpha, beta):
    l1 = math.log(p1 / p0)
    l0 = math.log((1 - p1) / (1 - p0))
    a = math.log((1 - beta) / alpha)
    b = math.log(beta / (1 - alpha))
    npos = 0
    decision, nd, llr_d = "continue", None, None
    llr = 0.0
    for n, x in enumerate(xs, start=1):
        npos += x
        llr = npos * l1 + (n - npos) * l0
        if decision == "continue":
            if llr >= a:
                decision, nd, llr_d = "h1", n, llr
            elif llr <= b:
                decision, nd, llr_d = "h0", n, llr
    return len(xs), npos, decision, nd, llr_d, llr


@pytest.mark.parametrize("rate", [0.05, 0.2, 0.5])
def test_sprt_matches_brute(spark, rate):
    from hiselspark.operators.seqtest import sprt
    rng = np.random.default_rng(11)
    rows = []
    streams = {}
    for e in range(12):
        xs = (rng.random(80) < rate).astype(int).tolist()
        streams[e] = xs
        rows += [(e, i, int(x)) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "entity long, seq long, x int")
    got = {r["entity"]: r for r in
           sprt(df, "entity", ["seq"], "x",
                p0=0.15, p1=0.25).collect()}
    for e, xs in streams.items():
        n, npos, dec, nd, llr_d, llr_f = _brute_sprt(
            xs, 0.15, 0.25, 0.05, 0.2)
        assert got[e]["n_total"] == n
        assert got[e]["n_pos"] == npos
        assert got[e]["decision"] == dec
        assert got[e]["n_decide"] == nd
        if nd is None:
            assert got[e]["llr_decide"] is None
        else:
            assert got[e]["llr_decide"] == pytest.approx(
                round(llr_d, 6), abs=1e-12)
        assert got[e]["llr_final"] == pytest.approx(
            round(llr_f, 6), abs=1e-12)


def test_sprt_low_rate_accepts_h0_high_rate_h1(spark):
    from hiselspark.operators.seqtest import sprt
    # all-failures stream must accept H0; all-successes must accept H1
    rows = ([(0, i, 0) for i in range(60)]
            + [(1, i, 1) for i in range(60)])
    df = spark.createDataFrame(rows, "entity long, seq long, x int")
    got = {r["entity"]: r for r in
           sprt(df, "entity", ["seq"], "x",
                p0=0.15, p1=0.25).collect()}
    assert got[0]["decision"] == "h0"
    assert got[1]["decision"] == "h1"
    # H1 on a pure-success stream decides faster than H0 on failures
    assert got[1]["n_decide"] < got[0]["n_decide"]


def test_sprt_validates_params(spark):
    from hiselspark.operators.seqtest import sprt_constants
    with pytest.raises(ValueError):
        sprt_constants(0.3, 0.2, 0.05, 0.2)
    with pytest.raises(ValueError):
        sprt_constants(0.1, 0.2, 0.0, 0.2)
