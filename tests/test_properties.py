"""Property-based tests (hypothesis): the PIT operators against
single-node oracles on RANDOMIZED inputs — shapes, gaps, ties, and
boundary cases a fixed seed can miss.  Example counts are kept small
because every example is a Spark round trip."""
import pytest
import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from hypothesis import given, settings, strategies as st

from hiselspark.operators.asof import asof_join
from hiselspark.operators.windows import merge_intervals, sessionize

SET = settings(max_examples=8, deadline=None)


@st.composite
def timelines(draw):
    n_feat = draw(st.integers(1, 12))
    n_lab = draw(st.integers(1, 10))
    # unique (entity, ts) pairs on the feature side: matches pandas
    # merge_asof tie semantics without a tiebreaker column
    pairs = draw(st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 500)),
        min_size=n_feat, max_size=n_feat, unique=True))
    feats = pd.DataFrame({
        "entity_id": [p[0] for p in pairs],
        "ts": pd.to_datetime([p[1] for p in pairs], unit="s"),
        "v": list(range(len(pairs))),
    })
    labs = pd.DataFrame({
        "entity_id": draw(st.lists(st.integers(0, 2), min_size=n_lab,
                                   max_size=n_lab)),
        "ts": pd.to_datetime(
            draw(st.lists(st.integers(0, 500), min_size=n_lab,
                          max_size=n_lab)), unit="s"),
    })
    return feats, labs


@SET
@given(timelines())
def test_asof_backward_matches_pandas_merge_asof(spark, data):
    feats, labs = data
    got = (asof_join(spark.createDataFrame(labs),
                     spark.createDataFrame(feats),
                     on="entity_id", value_cols=["v"])
           .toPandas()
           .sort_values(["entity_id", "ts"]).reset_index(drop=True))
    exp = pd.merge_asof(
        labs.sort_values("ts"), feats.sort_values("ts"),
        on="ts", by="entity_id", direction="backward") \
        .sort_values(["entity_id", "ts"]).reset_index(drop=True)
    pd.testing.assert_series_equal(got["v"], exp["v"],
                                   check_dtype=False)


@SET
@given(st.lists(st.integers(0, 7200), min_size=1, max_size=40),
       st.integers(60, 3600))
def test_sessionize_gap_rule(spark, offsets, gap):
    pdf = pd.DataFrame({
        "entity": 0,
        "ts": pd.to_datetime(sorted(offsets), unit="s"),
    })
    got = (sessionize(spark.createDataFrame(pdf), "entity", "ts",
                      float(gap))
           .toPandas().sort_values("ts")["session_id"].tolist())
    sid, exp, prev = 0, [], None
    for t in sorted(offsets):
        if prev is not None and t - prev > gap:
            sid += 1
        exp.append(sid)
        prev = t
    assert got == exp


@SET
@given(st.lists(st.tuples(st.integers(0, 1000), st.integers(1, 300)),
                min_size=1, max_size=30))
def test_merge_intervals_covers_and_separates(spark, spans):
    pdf = pd.DataFrame({
        "iid": range(len(spans)),
        "entity": 0,
        "s": [a for a, _ in spans],
        "e": [a + w for a, w in spans],
    })
    out = (merge_intervals(spark.createDataFrame(pdf), "entity", "s",
                           "e", tie_cols=("iid",))
           .toPandas().sort_values("island_start"))
    # every input interval is inside exactly one island
    for a, w in spans:
        hit = out[(out["island_start"] <= a)
                  & (out["island_end"] >= a + w)]
        assert len(hit) == 1
    # islands are disjoint with strict gaps, and counts add up
    starts = out["island_start"].to_numpy()
    ends = out["island_end"].to_numpy()
    assert (starts[1:] > ends[:-1]).all()
    assert out["n_intervals"].sum() == len(spans)


@st.composite
def corpora(draw):
    words = ["the", "cat", "dog", "sat", "spark", "zyx", "a", "run"]
    n_docs = draw(st.integers(2, 8))
    texts = [" ".join(draw(st.lists(st.sampled_from(words),
                                    min_size=0, max_size=12)))
             for _ in range(n_docs)]
    return pd.DataFrame({"doc_id": range(n_docs), "text": texts})


@SET
@given(corpora())
def test_token_logprob_matches_python_twin(spark, pdf):
    from hiselspark.functions.text import token_logprob
    got = (token_logprob(spark.createDataFrame(pdf), "doc_id", "text")
           .toPandas().set_index("doc_id")["token_logprob"])
    toks = {i: t.split() for i, t in zip(pdf["doc_id"], pdf["text"])}
    vocab = pd.Series([w for ts in toks.values() for w in ts]
                      ).value_counts()
    n = float(vocab.sum()) if len(vocab) else 0.0
    for i, ts in toks.items():
        if not ts:
            assert pd.isna(got[i])
        else:
            exp = float(np.mean([np.log(vocab[w] / n) for w in ts]))
            assert got[i] == pytest.approx(exp, abs=1e-12)


@SET
@given(corpora())
def test_bm25_nonnegative_and_bounded_by_sum_idf_k1p1(spark, pdf):
    from hiselspark.functions.text import bm25_score
    got = (bm25_score(spark.createDataFrame(pdf), "doc_id",
                      "the spark dog", "text")
           .toPandas())
    n = float(len(pdf))
    toks = {i: set(t.split()) for i, t in
            zip(pdf["doc_id"], pdf["text"])}
    dfreq = {w: sum(w in ts for ts in toks.values())
             for w in ("the", "spark", "dog")}
    # per-term score is in (0, idf*(k1+1)); sum over matched terms
    for r in got.itertuples():
        cap = sum(np.log(1 + (n - dfreq[w] + 0.5) / (dfreq[w] + 0.5))
                  * 2.2 for w in toks[r.doc_id]
                  if w in ("the", "spark", "dog"))
        assert 0 < r.bm25 <= cap + 1e-9
    # only docs with >= 1 matched term appear
    matched = {i for i, ts in toks.items()
               if ts & {"the", "spark", "dog"}}
    assert set(got["doc_id"]) == matched


@SET
@given(st.lists(st.integers(-50, 50), min_size=1, max_size=60),
       st.integers(-10, 10), st.integers(0, 5))
def test_cusum_closed_form_equals_recursion_property(
        spark, xs, target, slack):
    """The running-sum-minus-running-min closed form IS Page's
    recursion, for any values/target/slack (incl. negatives)."""
    from hiselspark.operators.windows import cusum
    pdf = pd.DataFrame({
        "e": "u",
        "ts": pd.to_datetime(np.arange(len(xs)), unit="m"),
        "x": [float(v) for v in xs],
        "i": range(len(xs)),
    })
    out = (cusum(spark.createDataFrame(pdf), "e", "ts", "x",
                 target=float(target), slack=float(slack),
                 tiebreak=("i",))
           .toPandas().sort_values("i").reset_index(drop=True))
    sp = sn = 0.0
    for i, x in enumerate(xs):
        sp = max(0.0, sp + (x - (target + slack)))
        sn = max(0.0, sn + ((target - slack) - x))
        assert out.loc[i, "cusum_pos"] == pytest.approx(sp, abs=1e-9)
        assert out.loc[i, "cusum_neg"] == pytest.approx(sn, abs=1e-9)


@SET
@given(st.lists(st.integers(0, 9), min_size=1, max_size=50),
       st.integers(1, 20))
def test_rolling_rank_property_with_ties(spark, xs, win_minutes):
    """Trailing percentile rank under heavy value ties: always in
    (0, 1], exact count ratio vs brute force."""
    from hiselspark.operators.windows import rolling_rank
    ts = pd.to_datetime(np.arange(len(xs)) * 60, unit="s")
    pdf = pd.DataFrame({"e": "u", "ts": ts, "x": xs,
                        "i": range(len(xs))})
    out = (rolling_rank(spark.createDataFrame(pdf), "e", "ts", "x",
                        win_minutes * 60.0, out_col="rr")
           .toPandas().sort_values("i").reset_index(drop=True))
    secs = np.arange(len(xs)) * 60
    arr = np.asarray(xs)
    for i in range(len(xs)):
        w = arr[(secs >= secs[i] - win_minutes * 60) & (secs <= secs[i])]
        want = np.mean(w <= arr[i])
        assert out.loc[i, "rr"] == pytest.approx(want, abs=1e-12)
        assert 0 < out.loc[i, "rr"] <= 1


@SET
@given(st.lists(st.integers(900, 1100), min_size=2, max_size=40),
       st.integers(1, 30))
def test_triple_barrier_property(spark, lvls, horizon_minutes):
    """First-barrier-hit labels vs brute force, any series/horizon."""
    from hiselspark.operators.labels import triple_barrier
    n = len(lvls)
    ts = pd.to_datetime(np.arange(n) * 60, unit="s")
    pdf = pd.DataFrame({"e": "u", "ts": ts, "lvl": lvls,
                        "i": range(n)})
    h = horizon_minutes * 60.0
    out = (triple_barrier(spark.createDataFrame(pdf), "e", "ts",
                          "lvl", h, 0.02, 0.02)
           .toPandas().sort_values("i").reset_index(drop=True))
    for i in range(n):
        up, dn = lvls[i] * 1.02, lvls[i] * 0.98
        label, tsec = 0, h
        for j in range(i + 1, n):
            if (j - i) * 60.0 > h:
                break
            if lvls[j] >= up or lvls[j] <= dn:
                label = 1 if lvls[j] >= up else -1
                tsec = (j - i) * 60.0
                break
        assert out.loc[i, "tb_label"] == label, (i, lvls)
        assert out.loc[i, "tb_seconds"] == pytest.approx(tsec)


@SET
@given(st.lists(st.integers(0, 30), min_size=2, max_size=60),
       st.lists(st.integers(0, 30), min_size=2, max_size=60))
def test_ks_statistic_property(spark, a, b):
    """Exact KS equals the brute-force ECDF sup for any two integer
    samples (heavy ties included)."""
    from hiselspark.operators.drift import ks_statistic
    pdf = pd.DataFrame({"v": a + b,
                        "r": [1] * len(a) + [0] * len(b)})
    row = ks_statistic(spark.createDataFrame(pdf), "v",
                       F.col("r") == 1).collect()[0]
    aa, bb = np.asarray(a), np.asarray(b)
    vals = np.unique(pdf.v)
    want = max(abs((aa <= v).mean() - (bb <= v).mean())
               for v in vals)
    assert row["ks"] == pytest.approx(want, abs=1e-12)


@SET
@given(st.lists(st.integers(-100, 100), min_size=5, max_size=80),
       st.sampled_from([0.0, 0.05, 0.1, 0.25, 0.4]))
def test_trimmed_mean_property(spark, xs, frac):
    """Count-table trimmed mean equals sort-and-slice for any sample
    and trim fraction (incl. ties at the cut)."""
    from hiselspark.operators.profile import trimmed_mean
    pdf = pd.DataFrame({"v": xs})
    row = trimmed_mean(spark.createDataFrame(pdf), "v",
                       frac).collect()[0]
    k = int(np.floor(len(xs) * frac))
    s = np.sort(np.asarray(xs))
    want = s[k:len(xs) - k].mean()
    assert row["trimmed_mean"] == pytest.approx(want, abs=1e-9)
    assert row["n_used"] == len(xs) - 2 * k


@given(st.lists(st.tuples(st.integers(0, 9), st.integers(0, 2)),
                min_size=5, max_size=60))
@SET
def test_competing_risks_partition_of_unity(spark, rows):
    """surv + cif1 + cif2 == 1 at EVERY step, for any duration/cause
    multiset (the Aalen-Johansen ledger identity)."""
    from hiselspark.operators.survival import competing_risks
    df = spark.createDataFrame(
        [("c", int(d), int(e)) for d, e in rows],
        ["cohort", "dur", "cause"])
    out = competing_risks(df, "cohort", "dur", "cause").collect()
    for r in out:
        assert r["surv"] + r["cif1"] + r["cif2"] == pytest.approx(
            1.0, abs=1e-9)
        assert r["cif1"] >= -1e-12 and r["cif2"] >= -1e-12
        assert -1e-12 <= r["surv"] <= 1 + 1e-12


@given(st.lists(st.tuples(st.integers(0, 4), st.integers(0, 30)),
                min_size=4, max_size=80))
@SET
def test_growth_accounting_identities(spark, rows):
    """active = new + retained + resurrected per period, churn(p) =
    active(p-1) - retained(p), and Σnew = distinct entities."""
    import datetime as dt
    from hiselspark.operators.windows import growth_accounting
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(int(e), base + dt.timedelta(days=int(p)))
         for e, p in rows], ["u", "ts"])
    out = {r["period"]: r for r in
           growth_accounting(df, "u", "ts",
                             period_seconds=86400.0).collect()}
    active = {}
    for p, r in out.items():
        assert r["n_active"] == (r["n_new"] + r["n_retained"]
                                 + r["n_resurrected"])
        active[p] = r["n_active"]
    for p, r in out.items():
        prev = active.get(p - 1, 0)
        assert r["n_churned"] == prev - r["n_retained"]
    assert sum(r["n_new"] for r in out.values()) == \
        len({e for e, _ in rows})


@given(st.lists(st.integers(-50, 50), min_size=2, max_size=60),
       st.lists(st.integers(-50, 50), min_size=2, max_size=60))
@SET
def test_mmd_nonnegative_and_zero_on_identical(spark, a, b):
    """Biased RBF-MMD² is ≥ 0 for any two samples and ~0 when the
    two populations are identical multisets."""
    from hiselspark.operators.drift import mmd_rbf_drift
    rows = ([(int(v), 1) for v in a] + [(int(v), 0) for v in b])
    df = spark.createDataFrame(rows, ["v", "r"])
    m = mmd_rbf_drift(df, "v", F.col("r") == 1).collect()[0]
    assert m["mmd2"] >= -1e-12
    rows2 = ([(int(v), 1) for v in a] + [(int(v), 0) for v in a])
    df2 = spark.createDataFrame(rows2, ["v", "r"])
    m2 = mmd_rbf_drift(df2, "v", F.col("r") == 1).collect()[0]
    assert abs(m2["mmd2"]) < 1e-9


@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 5)),
                min_size=10, max_size=100))
@SET
def test_somers_kendall_consistency(spark, pairs):
    """|D_yx| ≥ |tau_b| never holds in general, but sign consistency
    does: C−D determines the sign of BOTH statistics, and both are
    bounded in [−1, 1]."""
    from hiselspark.operators.rankstats import kendall_tau, somers_d
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in pairs], ["x", "y"])
    kt = kendall_tau(df, "x", "y").collect()[0]
    sd = somers_d(df, "x", "y").collect()[0]
    # kendall's pre-existing contract leaves counts NULL on a
    # single-x degenerate input; somers_d coalesces to 0
    assert (kt["concordant"] or 0) == sd["concordant"]
    assert (kt["discordant"] or 0) == sd["discordant"]
    cd = sd["concordant"] - sd["discordant"]
    for v in (sd["d_yx"], sd["d_xy"], kt["tau_b"]):
        if v is not None:
            assert -1 - 1e-12 <= v <= 1 + 1e-12
            if cd != 0:
                assert (v > 0) == (cd > 0) or v == 0


@given(st.lists(st.integers(0, 1000), min_size=3, max_size=50))
@SET
def test_holm_rejects_subset_of_bh(spark, raw):
    """Holm (FWER) never rejects a hypothesis that BH (FDR) keeps —
    Holm ⊆ BH on identical inputs."""
    from hiselspark.operators.drift import bh_adjust, holm_adjust
    ps = [p / 1000.0 for p in raw]
    df = spark.createDataFrame(
        [(f"h{i}", p) for i, p in enumerate(ps)], ["key", "p"])
    bh = {r["key"]: r["reject"] for r in
          bh_adjust(df, "key", "p").collect()}
    hm = {r["key"]: r["reject"] for r in
          holm_adjust(df, "key", "p").collect()}
    for k, rej in hm.items():
        if rej:
            assert bh[k], f"Holm rejected {k} but BH did not"
