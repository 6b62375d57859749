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
