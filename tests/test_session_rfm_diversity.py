"""sessionize_capped / rfm_features / distinct_ngram_ratios vs brute."""
import datetime as dt

import numpy as np
import pytest

from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1)


def test_sessionize_capped_brute(spark):
    # gaps of 10 min; gap rule 30 min; cap 45 min -> cap forces breaks
    # every 5 events even though no gap break fires
    times = [BASE + dt.timedelta(minutes=10 * i) for i in range(20)]
    times += [times[-1] + dt.timedelta(hours=2)]   # gap break
    rows = [("u", t, i) for i, t in enumerate(times)]
    df = spark.createDataFrame(rows, "e string, ts timestamp, o long")
    from hiselspark.operators.windows import sessionize_capped
    out = {r["order_id"]: r for r in
           sessionize_capped(df, "e", "ts", "o", gap_seconds=1800.0,
                             cap_seconds=2700.0).collect()}
    # brute replay
    sid, start, last = 0, times[0], times[0]
    expect = {}
    for i, t in enumerate(times):
        if i > 0:
            if ((t - last).total_seconds() > 1800
                    or (t - start).total_seconds() > 2700):
                sid += 1
                start = t
        expect[i] = (sid, start)
        last = t
    for i, (sid_e, start_e) in expect.items():
        assert out[i]["session_id"] == sid_e, i
        assert out[i]["session_start_us"] == int(
            start_e.replace(tzinfo=dt.timezone.utc).timestamp()
        ) * 1_000_000
    # the cap actually fired: more than the 2 gap-rule sessions
    assert max(r[0] for r in expect.values()) >= 4


def test_sessionize_capped_reduces_to_plain_gap_rule(spark):
    import math
    rng = np.random.default_rng(107)
    t = BASE
    rows = []
    for i in range(60):
        t += dt.timedelta(seconds=int(rng.integers(60, 4000)))
        rows.append(("u", t, i))
    df = spark.createDataFrame(rows, "e string, ts timestamp, o long")
    from hiselspark.operators.windows import (sessionize,
                                              sessionize_capped)
    capped = sessionize_capped(df, "e", "ts", "o",
                               gap_seconds=1800.0,
                               cap_seconds=10**9)
    plain = sessionize(df, "e", "ts", gap_seconds=1800.0)
    a = {r["order_id"]: r["session_id"] for r in capped.collect()}
    b = {r["o"]: r["session_id"] for r in plain.collect()}
    assert a == b  # infinite cap == the classic gap rule


def test_rfm_brute(spark):
    rng = np.random.default_rng(109)
    rows = []
    for u in range(30):
        n = int(rng.integers(3, 15))
        for i in range(n):
            rows.append((u, BASE + dt.timedelta(
                days=int(rng.integers(0, 18)),
                seconds=int(rng.integers(0, 80000))),
                i, int(rng.integers(10, 5000))))
    df = spark.createDataFrame(
        rows, "u long, ts timestamp, o long, cents long")
    cutoff = dt.datetime(2024, 1, 15)
    from hiselspark.operators.labels import rfm_features
    out = {r["entity"]: r for r in
           rfm_features(df, "u", "ts", "cents",
                        "2024-01-15 00:00:00", n_bins=5).collect()}
    per = {}
    for u, ts, o, c in rows:
        if ts >= cutoff:
            continue
        e = per.setdefault(u, {"last": ts, "n": 0, "m": 0})
        e["last"] = max(e["last"], ts)
        e["n"] += 1
        e["m"] += c
    for u, e in per.items():
        r = out[u]
        gap_us = int((cutoff - e["last"]).total_seconds() * 1e6)
        assert r["recency_days"] == gap_us // 86_400_000_000
        assert r["frequency"] == e["n"]
        assert r["monetary"] == e["m"]
    # score direction: the most recent user outscores the stalest
    recs = {u: out[u]["recency_days"] for u in per}
    freshest = min(recs, key=lambda u: (recs[u], u))
    stalest = max(recs, key=lambda u: (recs[u], u))
    assert out[freshest]["r_score"] >= out[stalest]["r_score"]


def test_distinct_ngram_ratios_brute(spark):
    docs = [(1, "a b a b a"), (2, "a b c"), (3, "x x x x")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from hiselspark.functions.text import distinct_ngram_ratios
    out = {r["n"]: r for r in
           distinct_ngram_ratios(df, "text", max_n=2).collect()}
    # unigrams: 5+3+4=12 total; distinct {a,b,c,x}=4
    assert out[1]["total"] == 12 and out[1]["n_distinct"] == 4
    # bigrams: 4+2+3=9 total; distinct {a b, b a, b c, x x} = 4
    assert out[2]["total"] == 9 and out[2]["n_distinct"] == 4
    assert out[2]["distinct_ratio"] == pytest.approx(4 / 9, rel=1e-12)


def test_item_cf_brute(spark):
    rng = np.random.default_rng(113)
    rows = []
    for u in range(25):
        basket = rng.choice(30, size=int(rng.integers(3, 9)),
                            replace=False)
        for it in basket:
            rows.append((u, int(it)))
    df = spark.createDataFrame(rows, "u long, it long")
    from hiselspark.operators.cooccur import item_cf_topk
    out = {}
    for r in item_cf_topk(df, "u", "it", k=3,
                          min_cooccur=1).collect():
        out.setdefault(r["user"], []).append(
            (r["rk"], r["item"], r["score"]))
    import math
    from collections import Counter, defaultdict
    baskets = defaultdict(set)
    for u, it in rows:
        baskets[u].add(it)
    cnt = Counter(it for _, it in rows)
    co = Counter()
    for u, b in baskets.items():
        for i in b:
            for j in b:
                if i != j:
                    co[(i, j)] += 1
    for u, b in baskets.items():
        scores = defaultdict(float)
        for i in sorted(b):
            for (ii, j), c in co.items():
                if ii == i and j not in b:
                    scores[j] += c / math.sqrt(cnt[i] * cnt[j])
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        got = sorted(out.get(u, []))
        for (rk, item, sc), (ej, es) in zip(got, top):
            assert item == ej
            assert sc == pytest.approx(es, rel=1e-9)


def test_item_cf_never_recommends_owned(spark):
    rows = [(u, it) for u in range(10) for it in range(5)]
    rows += [(0, 7), (1, 7)]   # item 7 co-occurs with everything
    df = spark.createDataFrame(rows, "u long, it long")
    from hiselspark.operators.cooccur import item_cf_topk
    recs = item_cf_topk(df, "u", "it", k=5, min_cooccur=1).collect()
    owned = {}
    for u, it in rows:
        owned.setdefault(u, set()).add(it)
    for r in recs:
        assert r["item"] not in owned[r["user"]]
    # users 2..9 (who lack item 7) should be recommended it
    assert any(r["item"] == 7 and r["user"] >= 2 for r in recs)


def test_vocab_drift_brute(spark):
    """vocab_drift vs set arithmetic on a tiny corpus with known
    overlap, OOV occurrences, and empty docs."""
    from hiselspark.functions.text import vocab_drift
    ref = spark.createDataFrame(
        [(0, "the cat sat"), (2, "the dog ran"), (4, "  ")],
        "doc_id long, text string")
    cand = spark.createDataFrame(
        [(1, "the cat flew"), (3, "a cat flew flew"), (5, "")],
        "doc_id long, text string")
    r = vocab_drift(ref, cand).first()
    # ref vocab {the,cat,sat,dog,ran}; cand vocab {the,cat,flew,a}
    assert r["vocab_ref"] == 5 and r["vocab_cand"] == 4
    assert r["vocab_common"] == 2                 # the, cat
    # cand occurrences: the(1) cat(2) flew(3) a(1) = 7; OOV: flew+a=4
    assert r["cand_tokens"] == 7 and r["oov_tokens"] == 4
    assert r["vocab_jaccard"] == pytest.approx(2 / 7, rel=1e-12)
    assert r["oov_rate"] == pytest.approx(4 / 7, rel=1e-12)


def test_token_fertility_brute(spark):
    """fertility/chars-per-token vs hand counts, fragmenting text
    scores higher fertility, empty docs dropped."""
    from hiselspark.functions.text import token_fertility
    rows = [(0, "hello world"),            # 2 words, 2 pretokens
            (1, "don't stop-me now!!"),    # punctuation fragments
            (2, "   "),                    # dropped
            (3, "abc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in token_fertility(df).collect()}
    assert 2 not in out
    r0 = out[0]
    assert r0["n_words"] == 2 and r0["n_pretokens"] == 2
    assert r0["fertility"] == 1.0
    assert r0["chars_per_token"] == pytest.approx(11 / 2)
    # doc 1 has 3 words but more pretokens (apostrophe/hyphen/bangs)
    r1 = out[1]
    assert r1["n_words"] == 3
    assert r1["n_pretokens"] > 3
    assert r1["fertility"] > 1.0
    assert out[3]["n_words"] == out[3]["n_pretokens"] == 1
