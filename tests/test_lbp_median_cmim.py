"""LBP / median-filter image stats and CMIM selection vs brute-force
references."""
import math

import numpy as np
import pytest

from pyspark.sql import functions as F

OFFS = ((-1, -1), (-1, 0), (-1, 1), (0, 1),
        (1, 1), (1, 0), (1, -1), (0, -1))


def _mk_imgs(spark, n=6, w=8, h=8, seed=31):
    rng = np.random.default_rng(seed)
    rows = []
    arrs = {}
    for i in range(n):
        a = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        arrs[i] = a
        rows.append((i, w, h, "raw", bytearray(a.tobytes())))
    df = spark.createDataFrame(
        rows, "okey long, w int, h int, fmt string, bytes binary")
    return df, arrs


def test_lbp_brute(spark):
    df, arrs = _mk_imgs(spark)
    from hiselspark.functions.image import with_lbp_stats
    out = {r["okey"]: r for r in with_lbp_stats(df).collect()}
    for i, a in arrs.items():
        g = a.sum(axis=2, dtype=np.int64)
        h, w = g.shape
        codes = []
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                c = 0
                for bit, (dy, dx) in enumerate(OFFS):
                    if g[y + dy, x + dx] >= g[y, x]:
                        c |= 1 << bit
                codes.append(c)
        assert out[i]["lbp_sum"] == sum(codes)
        assert out[i]["lbp_distinct"] == len(set(codes))

        def uniform(c):
            bits = [(c >> b) & 1 for b in range(8)]
            return sum(bits[b] != bits[(b + 1) % 8]
                       for b in range(8)) <= 2
        assert out[i]["lbp_n_uniform"] == sum(uniform(c)
                                              for c in codes)


def test_lbp_flat_image_is_all_ones(spark):
    # constant image: every neighbor >= center -> code 255 everywhere
    a = np.full((8, 8, 3), 7, dtype=np.uint8)
    df = spark.createDataFrame(
        [(0, 8, 8, "raw", bytearray(a.tobytes()))],
        "okey long, w int, h int, fmt string, bytes binary")
    from hiselspark.functions.image import with_lbp_stats
    r = with_lbp_stats(df).collect()[0]
    assert r["lbp_sum"] == 255 * 36
    assert r["lbp_distinct"] == 1
    assert r["lbp_n_uniform"] == 36  # 255 has 0 transitions


def test_median3_brute(spark):
    df, arrs = _mk_imgs(spark, seed=37)
    from hiselspark.functions.image import with_median3_stats
    out = {r["okey"]: r for r in with_median3_stats(df).collect()}
    for i, a in arrs.items():
        g = a.sum(axis=2, dtype=np.int64)
        h, w = g.shape
        meds, changed = [], 0
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                nb = sorted(g[y + dy, x + dx]
                            for dy in (-1, 0, 1) for dx in (-1, 0, 1))
                m = nb[4]
                meds.append(m)
                changed += int(m != g[y, x])
        assert out[i]["med_sum"] == sum(meds)
        assert out[i]["med_max"] == max(meds)
        assert out[i]["n_changed"] == changed


def test_median3_removes_impulse(spark):
    a = np.full((8, 8, 3), 50, dtype=np.uint8)
    a[4, 4] = 255  # salt pixel
    df = spark.createDataFrame(
        [(0, 8, 8, "raw", bytearray(a.tobytes()))],
        "okey long, w int, h int, fmt string, bytes binary")
    from hiselspark.functions.image import with_median3_stats
    r = with_median3_stats(df).collect()[0]
    assert r["med_max"] == 150       # the impulse is gone
    assert r["n_changed"] == 1       # only the salt pixel changed


def _brute_mi(xs, ys):
    from collections import Counter
    n = len(xs)
    cxy = Counter(zip(xs, ys))
    cx, cy = Counter(xs), Counter(ys)
    return sum(c / n * math.log(c * n / (cx[x] * cy[y]))
               for (x, y), c in cxy.items())


def _brute_cmi(xs, ys, zs):
    from collections import Counter
    n = len(xs)
    cxyz = Counter(zip(xs, ys, zs))
    cz = Counter(zs)
    cxz = Counter(zip(xs, zs))
    cyz = Counter(zip(ys, zs))
    return sum(c / n * math.log(c * cz[z] / (cxz[(x, z)] * cyz[(y, z)]))
               for (x, y, z), c in cxyz.items())


def test_cmim_brute(spark):
    rng = np.random.default_rng(41)
    n = 400
    a = rng.integers(0, 4, n)
    b = (a + rng.integers(0, 2, n)) % 4   # near-copy of a
    c = rng.integers(0, 3, n)
    y = (a + c) % 3
    rows = [(int(a[i]), int(b[i]), int(c[i]), int(y[i]))
            for i in range(n)]
    df = spark.createDataFrame(rows, "fa long, fb long, fc long, y long")
    from hiselspark.operators.feature_rank import cmim_select
    out = cmim_select(df, ["fa", "fb", "fc"], "y", k=3).collect()
    xs = {"fa": a.tolist(), "fb": b.tolist(), "fc": c.tolist()}
    rel = {f: _brute_mi(v, y.tolist()) for f, v in xs.items()}
    # replicate the greedy
    feats = sorted(xs)
    selected, rows_expect = [], []
    for step in range(1, 4):
        best = None
        for f in feats:
            if f in selected:
                continue
            s = (min(_brute_cmi(xs[f], y.tolist(), xs[s0])
                     for s0 in selected) if selected else rel[f])
            if best is None or s > best[0]:
                best = (s, f)
        rows_expect.append((step, best[1], rel[best[1]], best[0]))
        selected.append(best[1])
    for got, exp in zip(sorted(out, key=lambda r: r["rk"]),
                        rows_expect):
        assert got["rk"] == exp[0] and got["feature"] == exp[1]
        assert got["relevance"] == pytest.approx(exp[2], rel=1e-9)
        assert got["cmim_score"] == pytest.approx(exp[3], rel=1e-9)
    # CMIM must rank the near-copy fb LAST: once its twin is selected,
    # min-CMI collapses to ~0 while the complementary feature survives
    order = [r["feature"] for r in sorted(out, key=lambda r: r["rk"])]
    assert order[2] == "fb"


def test_snapshot_compact_roundtrip(spark, tmp_path):
    from hiselspark.sources.snapshots import SnapshotTable
    t = SnapshotTable(str(tmp_path / "tbl"))
    rows = [(i, f"r{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, s string")
    for lo in range(0, 100, 25):
        t.write(df.where(F.col("id").between(lo, lo + 24)).coalesce(1),
                mode="append")
    assert len(t.current().files) == 4
    snap = t.compact(spark, target_files=1, zorder_by=["id"])
    assert snap.operation == "compact" and len(snap.files) == 1
    got = sorted((r["id"], r["s"]) for r in t.read(spark).collect())
    assert got == rows
    # pre-compact version still time-travels
    old = t.read(spark, version=4).count()
    assert old == 100


def test_winnowing_guarantee_and_brute(spark):
    """The winnowing guarantee: a shared substring of length >=
    k + window - 1 produces at least one shared fingerprint; brute
    replay of hashes/window minima matches the operator."""
    M31 = 2147483647
    k, w = 8, 4

    def brute_fps(text):
        b = text.encode()
        n_pos = len(b) - k + 1
        if n_pos - w + 1 < 1:
            return set()
        hs = []
        for p in range(n_pos):
            h = 0
            for c in b[p:p + k]:
                h = (h * 31 + c) % M31
            hs.append(h)
        return {min(hs[p:p + w]) for p in range(n_pos - w + 1)}

    shared = "this exact sentence is copied verbatim between docs"
    docs = [(1, "alpha bravo " + shared + " charlie delta"),
            (2, "totally different prefix " + shared),
            (3, "no overlap here at all with anything else written"),
            (4, "tiny")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from hiselspark.operators.dedup import (winnowing_fingerprints,
                                            winnowing_pairs)
    got = {}
    for r in winnowing_fingerprints(df, "doc_id").collect():
        got.setdefault(r["id"], set()).add(r["fingerprint"])
    for i, t in docs:
        assert got.get(i, set()) == brute_fps(t), i
    pairs = {(r["a"], r["b"]): r["n_shared"] for r in
             winnowing_pairs(df, "doc_id", min_shared=1).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert all(3 not in p and 4 not in p for p in pairs)


def test_winnowing_fp_df_cap(spark):
    docs = [(i, "boilerplate header shared by every doc " + s)
            for i, s in enumerate(
                ["unique tail one two", "unique tail three four",
                 "other words five six", "more words seven eight"])]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from hiselspark.operators.dedup import winnowing_pairs
    allp = winnowing_pairs(df, "doc_id", min_shared=1).count()
    capped = winnowing_pairs(df, "doc_id", min_shared=1,
                             max_fp_df=2).count()
    assert capped <= allp


def test_quantile_bin_brute(spark):
    import numpy as np
    rng = np.random.default_rng(71)
    vals = rng.integers(0, 40, 500).tolist()
    df = spark.createDataFrame([(i, int(v)) for i, v in enumerate(vals)],
                               "id long, v long")
    from hiselspark.operators.encoding import quantile_bin
    out = {r["id"]: r["v_qbin"] for r in
           quantile_bin(df, "v", n_bins=10).collect()}
    n = len(vals)
    from collections import Counter
    cnt = Counter(vals)
    below = {}
    run = 0
    for v in sorted(cnt):
        below[v] = run
        run += cnt[v]
    for i, v in enumerate(vals):
        assert out[i] == (10 * below[v]) // n
    assert set(out.values()) <= set(range(10))
    # bins are populated and ordered with values
    assert out[vals.index(min(vals))] == 0


def test_snapshot_rollback_is_new_commit(spark, tmp_path):
    """rollback(v) restores v's content as a NEW version; the rolled-
    past commits stay time-travelable; vacuum keeps files the rollback
    references."""
    import pytest as _pt
    from hiselspark.sources.snapshots import SnapshotTable
    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame([(i, f"r{i}") for i in range(60)],
                               "id long, s string")
    t.write(df.where("id < 20").coalesce(1), mode="append")    # v1
    t.write(df.where("id >= 20 and id < 40").coalesce(1),
            mode="append")                                     # v2
    snap = t.rollback(1)
    assert snap.version == 3 and snap.operation == "rollback"
    assert snap.properties["rollback_of"] == "1"
    # latest == v1 content
    assert sorted(r["id"] for r in t.read(spark).collect()) \
        == list(range(20))
    # the rolled-past v2 still time-travels
    assert t.read(spark, version=2).count() == 40
    # appending after a rollback builds on the restored state
    t.write(df.where("id >= 40").coalesce(1), mode="append")   # v4
    assert sorted(r["id"] for r in t.read(spark).collect()) \
        == list(range(20)) + list(range(40, 60))
    # expire v1/v2 manifests, vacuum: v1's files survive because the
    # rollback commit references them; v2's data files are reclaimed
    t.expire_snapshots(keep_last=2)
    t.vacuum()
    assert sorted(r["id"] for r in t.read(spark).collect()) \
        == list(range(20)) + list(range(40, 60))
    with _pt.raises(ValueError):
        t.rollback(99)


def test_quantile_bin_null_rows_kept_with_null_bin(spark):
    # the add-a-column contract: NULL inputs keep their row and get a
    # NULL bin; they never enter the CDF counts
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, None), (5, None)],
        "id long, v long")
    from hiselspark.operators.encoding import quantile_bin
    out = {r["id"]: r["v_qbin"] for r in
           quantile_bin(df, "v", n_bins=2).collect()}
    assert len(out) == 6
    assert out[4] is None and out[5] is None
    # CDF over the 4 non-null values only: below/4*2
    assert out[0] == 0 and out[1] == 0 and out[2] == 1 and out[3] == 1
