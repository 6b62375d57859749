"""matched_pairs / log_odds_ratio vs brute-force Python oracles."""
from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pytest


def test_matched_pairs_matches_brute(spark):
    from hiselspark.operators.causal import matched_pairs
    rng = np.random.default_rng(29)
    rows = []
    for o in range(900):
        b = int(rng.integers(0, 4))
        t = 1 if b == 0 else int(rng.random() < 0.3)   # b=0 all treated
        y = int(rng.integers(0, 300)) + 25 * t
        rows.append((b, t, y, o))
    df = spark.createDataFrame(rows, "b long, t long, y long, o long")
    got = matched_pairs(df, "t", "y", "b", "o").collect()[0]

    by = defaultdict(lambda: ([], []))
    for b, t, y, o in sorted(rows, key=lambda r: r[3]):
        by[b][0 if t == 1 else 1].append(y)
    n_pairs = unm_t = unm_c = diff = 0
    for ts, cs in by.values():
        k = min(len(ts), len(cs))
        n_pairs += k
        unm_t += len(ts) - k
        unm_c += len(cs) - k
        diff += sum(ts[i] - cs[i] for i in range(k))
    assert got["n_pairs"] == n_pairs
    assert got["n_unmatched_treated"] == unm_t > 0   # b=0 tail
    assert got["n_unmatched_control"] == unm_c
    assert got["sum_diff_cents"] == diff
    assert got["att"] == pytest.approx(round(diff / n_pairs, 6))
    # the planted +25 effect must be visible
    assert 10 < got["att"] < 40


def test_log_odds_matches_brute_and_ranks_planted_word(spark):
    from hiselspark.operators.cooccur import log_odds_ratio
    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(20)]
    rows = []
    for i in range(200):
        fa = i % 2
        words = list(rng.choice(vocab, 8))
        if fa:
            words += ["planted"] * 2        # A-corpus marker
        rows.append((fa, " ".join(words)))
    df = spark.createDataFrame(rows, "fa long, text string")
    out = {r["word"]: r for r in
           log_odds_ratio(df, "text", "fa", alpha0=100.0,
                          min_count=5).collect()}

    ca, cb = Counter(), Counter()
    for fa, text in rows:
        (ca if fa else cb).update(text.split())
    na, nb = sum(ca.values()), sum(cb.values())
    nn = na + nb
    for w in set(ca) | set(cb):
        if ca[w] + cb[w] < 5:
            assert w not in out
            continue
        aw = 100.0 * (ca[w] + cb[w]) / nn
        delta = (math.log((ca[w] + aw) / (na + 100.0 - ca[w] - aw))
                 - math.log((cb[w] + aw) / (nb + 100.0 - cb[w] - aw)))
        z = delta / math.sqrt(1.0 / (ca[w] + aw) + 1.0 / (cb[w] + aw))
        r = out[w]
        assert r["ca"] == ca[w] and r["cb"] == cb[w]
        assert r["delta"] == pytest.approx(round(delta, 6), abs=1e-9)
        assert r["z"] == pytest.approx(round(z, 6), abs=1e-9)
    # the planted A-only word must top the z ranking
    top = max(out.values(), key=lambda r: r["z"])
    assert top["word"] == "planted" and top["z"] > 3
    with pytest.raises(ValueError):
        log_odds_ratio(df, "text", "fa", alpha0=0.0)
