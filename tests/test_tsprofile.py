"""ts_profile vs a plain-Python per-series reimplementation."""
import datetime as dt

import pytest

from hiselspark.operators.tsprofile import ts_profile

BASE = dt.datetime(2024, 1, 1)


def _brute(vs):
    n = len(vs)
    s = sum(vs)
    energy = sum(v * v for v in vs)
    mac = (sum(abs(vs[i + 1] - vs[i]) for i in range(n - 1)) / (n - 1)
           if n > 1 else None)
    peaks = sum(1 for i in range(1, n - 1)
                if vs[i] > vs[i - 1] and vs[i] > vs[i + 1])
    above = [v * n > s for v in vs]
    count_above = sum(above)
    longest = run = 0
    for a in above:
        run = run + 1 if a else 0
        longest = max(longest, run)
    vmax = max(vs)
    firsts = [i + 1 for i, v in enumerate(vs) if v == vmax]
    return (n, energy, mac, peaks, count_above, longest,
            firsts[0], firsts[-1])


@pytest.mark.parametrize("vs", [
    [5],                                  # singleton
    [3, 3, 3, 3],                         # constant (nothing above)
    [1, 5, 2, 5, 1, 5],                   # repeated maxima
    [1, 2, 3, 2, 1, 0, 4, 4, 9, 0, 8],    # peaks incl. plateau
    [(i * 37 + 11) % 50 for i in range(40)],
])
def test_ts_profile_matches_brute(spark, vs):
    rows = [(1, BASE + dt.timedelta(seconds=3 * i), i, v)
            for i, v in enumerate(vs)]
    # a second entity interleaved, to prove partition isolation
    rows += [(2, BASE + dt.timedelta(seconds=2 * i), 100 + i, v * 2)
             for i, v in enumerate(vs[:3])]
    df = spark.createDataFrame(
        rows, "entity int, ts timestamp, oid long, val long")
    got = {r["entity"]: r for r in
           ts_profile(df, "entity", "ts", "oid", "val").collect()}
    for ent, seq in [(1, vs), (2, [v * 2 for v in vs[:3]])]:
        (n, energy, mac, peaks, cabove, longest, fmax, lmax) = \
            _brute(seq)
        r = got[ent]
        assert r["n"] == n
        assert r["abs_energy"] == energy
        if mac is None:
            assert r["mean_abs_change"] is None
        else:
            assert r["mean_abs_change"] == pytest.approx(mac,
                                                         abs=1e-12)
        assert r["n_peaks"] == peaks
        assert r["count_above_mean"] == cabove
        assert r["longest_above"] == longest
        assert r["first_max_idx"] == fmax
        assert r["last_max_idx"] == lmax


def test_sax_matches_brute(spark):
    import math
    from hiselspark.operators.tsprofile import (SAX_BREAKPOINTS_4,
                                                sax_symbols)
    specs = {
        1: [(i * 13 + 5) % 40 for i in range(20)],
        2: [7] * 10,                      # constant -> all 'c' (z=0)
        3: list(range(16)),               # ramp -> a..d monotone word
        4: [1, 2, 3],                     # n < segments -> dropped
    }
    rows, oid = [], 0
    for ent, vs in specs.items():
        for i, v in enumerate(vs):
            rows.append((ent, BASE + dt.timedelta(seconds=i), oid, v))
            oid += 1
    df = spark.createDataFrame(
        rows, "entity int, ts timestamp, oid long, val long")
    got = {r["entity"]: r["sax"] for r in
           sax_symbols(df, "entity", "ts", "oid", "val",
                       n_segments=8).collect()}
    assert 4 not in got
    for ent in (1, 2, 3):
        vs = specs[ent]
        n, s, ssq = len(vs), sum(vs), sum(v * v for v in vs)
        var_num = n * ssq - s * s
        word = ""
        for seg in range(8):
            pts = [v for i, v in enumerate(vs)
                   if (i * 8) // n == seg]
            paa = sum(pts) / len(pts)
            z = (0.0 if var_num == 0
                 else (paa - s / n) / (math.sqrt(var_num) / n))
            k = sum(1 for b in SAX_BREAKPOINTS_4 if z >= b)
            word += "abcd"[k]
        assert got[ent] == word, (ent, got[ent], word)
    assert got[2] == "c" * 8
    assert got[3][0] == "a" and got[3][-1] == "d"
    assert got[3] == "".join(sorted(got[3]))


def test_seasonality_strength_matches_anova(spark):
    """eta2 vs a brute-force ANOVA, incl. the pure-seasonal (1.0),
    phase-independent (~0) and constant (NULL) extremes."""
    specs = {
        # pure function of hour -> eta2 == 1
        1: [(h, h % 24 * 10) for h in range(48)],
        # constant -> NULL
        2: [(h, 7) for h in range(24)],
        # value independent of hour pattern
        3: [(h, (h * 37 + 5) % 11) for h in range(72)],
    }
    rows = []
    for ent, seq in specs.items():
        for h, v in seq:
            rows.append((ent, BASE + dt.timedelta(hours=h), v))
    df = spark.createDataFrame(rows, "entity int, ts timestamp, val long")
    from hiselspark.operators.tsprofile import seasonality_strength
    got = {r["entity"]: r for r in
           seasonality_strength(df, "entity", "ts", "val").collect()}
    for ent, seq in specs.items():
        vs = [v for _, v in seq]
        ph = {}
        for h, v in seq:
            ph.setdefault(h % 24, []).append(v)
        n, s, q = len(vs), sum(vs), sum(v * v for v in vs)
        denom = q - s * s / n
        r = got[ent]
        assert r["n"] == n
        if denom == 0:
            assert r["eta2"] is None
            continue
        between = sum(sum(g) ** 2 / len(g) for g in ph.values())
        want = (between - s * s / n) / denom
        assert r["eta2"] == pytest.approx(want, abs=1e-9), ent
    assert got[1]["eta2"] == pytest.approx(1.0)
    assert got[3]["eta2"] < 0.5
