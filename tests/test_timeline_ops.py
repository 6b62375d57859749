"""Timeline feature ops: time-grid resample, rolling correlation,
EWMA, PSI drift, purged temporal split — vs pandas/NumPy oracles."""
import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from hiselspark.operators.drift import psi_drift
from hiselspark.operators.resample import resample_ffill, time_grid
from hiselspark.operators.splits import purged_time_split
from hiselspark.operators.windows import (distinct_so_far, ewma,
                                          rolling_corr,
                                          rolling_quantile)


@pytest.fixture(scope="module")
def events_pdf():
    rng = np.random.default_rng(7)
    n = 400
    pdf = pd.DataFrame({
        "event_id": np.arange(n),
        "entity": rng.integers(0, 12, n),
        "ts": pd.Timestamp("2024-03-01")
        + pd.to_timedelta(rng.integers(0, 14 * 86400, n), unit="s"),
        "x": rng.integers(-50, 500, n),
        "y": rng.integers(0, 100, n),
    })
    # duplicate-timestamp tie inside one entity
    pdf.loc[1, ["entity", "ts"]] = pdf.loc[0, ["entity", "ts"]]
    return pdf


def test_resample_ffill_matches_pandas(spark, events_pdf):
    step = 3600 * 6
    df = spark.createDataFrame(events_pdf)
    out = (resample_ffill(df, "entity", "ts", step, ["x"],
                          tie_col="event_id")
           .toPandas()
           .sort_values(["entity", "grid_ts"]).reset_index(drop=True))

    expected = []
    for ent, g in events_pdf.groupby("entity"):
        # tie rule: max event_id wins at an equal (entity, ts)
        g = (g.sort_values(["ts", "event_id"])
             .groupby("ts", as_index=False).last())
        t0 = (g["ts"].min().value // (step * 10**9)) * step
        t1 = (g["ts"].max().value // (step * 10**9)) * step
        grid = pd.to_datetime(np.arange(t0, t1 + step, step), unit="s")
        ser = (g.set_index("ts")["x"]
                .reindex(g["ts"].tolist() + list(grid))
                .sort_index().ffill().loc[grid])
        ser = ser[~ser.index.duplicated(keep="last")]
        for ts, v in ser.items():
            expected.append((ent, ts, v))
    exp = (pd.DataFrame(expected, columns=["entity", "grid_ts", "x"])
           .sort_values(["entity", "grid_ts"]).reset_index(drop=True))
    assert len(out) == len(exp)
    assert (out["grid_ts"] == exp["grid_ts"]).all()
    pd.testing.assert_series_equal(out["x"], exp["x"], check_dtype=False)


def test_time_grid_covers_single_event_entity(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"entity": [1], "ts": [pd.Timestamp("2024-03-01 05:30")]}))
    g = time_grid(df, "entity", "ts", 3600).toPandas()
    assert list(g["grid_ts"]) == [pd.Timestamp("2024-03-01 05:00")]


def test_rolling_corr_matches_pandas(spark, events_pdf):
    win = 3 * 86400.0
    df = spark.createDataFrame(events_pdf)
    out = (rolling_corr(df, "entity", "ts", "x", "y", win)
           .toPandas().set_index("event_id")["roll_corr"])
    for _, row in events_pdf.sample(60, random_state=0).iterrows():
        g = events_pdf[(events_pdf["entity"] == row["entity"])
                       & (events_pdf["ts"] >= row["ts"]
                          - pd.Timedelta(seconds=win))
                       & (events_pdf["ts"] <= row["ts"])]
        got = out.loc[row["event_id"]]
        if len(g) < 2 or g["x"].nunique() == 1 or g["y"].nunique() == 1:
            assert pd.isna(got)
        else:
            ref = np.corrcoef(g["x"], g["y"])[0, 1]
            assert got == pytest.approx(ref, abs=1e-12)


def test_ewma_matches_pandas_adjust(spark):
    # <= 9 rows per entity: the 8-lag bounded form IS full history
    pdf = pd.DataFrame({
        "event_id": range(9),
        "entity": [0] * 5 + [1] * 4,
        "ts": pd.date_range("2024-03-01", periods=9, freq="1h"),
        "x": [3, 1, 4, 1, 5, 9, 2, 6, 5],
    })
    df = spark.createDataFrame(pdf)
    out = (ewma(df, "entity", "ts", "x", alpha=0.5, max_lags=8,
                tie_cols=("event_id",))
           .toPandas().sort_values("event_id")["x_ewma"].to_numpy())
    exp = (pdf.groupby("entity")["x"]
              .transform(lambda s: s.ewm(alpha=0.5, adjust=True).mean())
              .to_numpy())
    np.testing.assert_allclose(out, exp, rtol=1e-12)


def test_ewma_null_values_skipped(spark):
    pdf = pd.DataFrame({
        "event_id": [0, 1, 2],
        "entity": [0, 0, 0],
        "ts": pd.date_range("2024-03-01", periods=3, freq="1h"),
        "x": [2.0, None, 4.0],
    })
    out = (ewma(spark.createDataFrame(pdf), "entity", "ts", "x",
                alpha=0.5, max_lags=8, tie_cols=("event_id",))
           .toPandas().sort_values("event_id")["x_ewma"].to_numpy())
    # row 2: weights 1 (self) and 0.25 (lag2) -> (4 + 0.25*2) / 1.25
    np.testing.assert_allclose(out, [2.0, 2.0, 4.5 / 1.25])


def test_psi_drift_zero_when_identical_and_positive_when_shifted(spark):
    pdf = pd.DataFrame({
        "key": ["a"] * 200 + ["b"] * 200,
        "bucket": ([0] * 50 + [1] * 50) * 2 + [0] * 150 + [1] * 50,
        "is_ref": ([True] * 100 + [False] * 100) * 2,
    })
    df = spark.createDataFrame(pdf)
    out = (psi_drift(df, ["key"], "bucket", F.col("is_ref"))
           .toPandas().set_index("key"))
    assert out.loc["a", "psi"] == 0.0  # identical shares, exact zero
    assert out.loc["b", "psi"] > 0.1   # 50/50 -> 100/0 is a real shift
    assert out.loc["b", "n_ref"] == 100 and out.loc["b", "n_cur"] == 100
    # reference value for the shifted key, same smoothing
    p = np.array([51.0, 51.0]) / 102.0
    q = np.array([101.0, 1.0]) / 102.0
    assert out.loc["b", "psi"] == pytest.approx(
        float(np.sum((q - p) * np.log(q / p))), rel=1e-12)


def test_jsd_drift_zero_identical_symmetric_and_bounded(spark):
    from hiselspark.operators.drift import jsd_drift
    pdf = pd.DataFrame({
        "key": ["a"] * 200 + ["b"] * 200,
        "bucket": ([0] * 50 + [1] * 50) * 2 + [0] * 150 + [1] * 50,
        "is_ref": ([True] * 100 + [False] * 100) * 2,
    })
    df = spark.createDataFrame(pdf)
    out = (jsd_drift(df, ["key"], "bucket", F.col("is_ref"))
           .toPandas().set_index("key"))
    assert out.loc["a", "jsd"] == 0.0          # identical shares
    assert 0.0 < out.loc["b", "jsd"] <= np.log(2.0)  # bounded by ln 2
    # reference value, same add-one smoothing
    p = np.array([51.0, 51.0]) / 102.0
    q = np.array([101.0, 1.0]) / 102.0
    m = (p + q) / 2.0
    exp = float(0.5 * np.sum(p * np.log(p / m))
                + 0.5 * np.sum(q * np.log(q / m)))
    assert out.loc["b", "jsd"] == pytest.approx(exp, rel=1e-12)
    # symmetric: swapping the populations leaves JSD unchanged
    swapped = (jsd_drift(df, ["key"], "bucket", ~F.col("is_ref"))
               .toPandas().set_index("key"))
    assert swapped.loc["b", "jsd"] == pytest.approx(
        out.loc["b", "jsd"], rel=1e-12)


def test_purged_split_boundaries(spark):
    cutoff = pd.Timestamp("2024-03-10 00:00:00")
    rows = {
        "train": cutoff - pd.Timedelta(days=2),
        "purged_edge": cutoff - pd.Timedelta(days=1),     # ts+h == cutoff
        "purged": cutoff - pd.Timedelta(hours=1),
        "embargo_edge": cutoff,
        "embargo": cutoff + pd.Timedelta(hours=11),
        "eval_edge": cutoff + pd.Timedelta(hours=12),
        "eval": cutoff + pd.Timedelta(days=3),
    }
    pdf = pd.DataFrame({"name": list(rows), "ts": list(rows.values())})
    out = (purged_time_split(spark.createDataFrame(pdf), "ts",
                             "2024-03-10 00:00:00",
                             label_horizon_seconds=86400.0,
                             embargo_seconds=12 * 3600.0)
           .toPandas().set_index("name")["split"])
    assert out["train"] == "train"
    assert out["purged_edge"] == "purged"
    assert out["purged"] == "purged"
    assert out["embargo_edge"] == "embargo"
    assert out["embargo"] == "embargo"
    assert out["eval_edge"] == "eval"
    assert out["eval"] == "eval"


def test_rolling_quantile_matches_numpy(spark, events_pdf):
    win = 2 * 86400.0
    df = spark.createDataFrame(events_pdf)
    out = (rolling_quantile(df, "entity", "ts", "x", 0.5, win,
                            out_col="med")
           .toPandas().set_index("event_id")["med"])
    for _, row in events_pdf.sample(40, random_state=1).iterrows():
        g = events_pdf[(events_pdf["entity"] == row["entity"])
                       & (events_pdf["ts"] >= row["ts"]
                          - pd.Timedelta(seconds=win))
                       & (events_pdf["ts"] <= row["ts"])]
        assert out.loc[row["event_id"]] == pytest.approx(
            float(np.quantile(g["x"], 0.5)), abs=1e-9)


def test_distinct_so_far_matches_pandas(spark, events_pdf):
    df = spark.createDataFrame(events_pdf)
    out = (distinct_so_far(df, "entity", "ts", "y", out_col="nd",
                           tie_cols=("event_id",))
           .toPandas().sort_values(["entity", "ts", "event_id"]))
    for ent, g in out.groupby("entity"):
        seen = set()
        for _, r in g.iterrows():
            seen.add(events_pdf.set_index("event_id").loc[
                r["event_id"], "y"])
            assert r["nd"] == len(seen)


def test_winsorize_pit_strictly_before(spark):
    from hiselspark.operators.windows import winsorize_pit
    rng = np.random.default_rng(11)
    n = 60
    pdf = pd.DataFrame({
        "event_id": range(n),
        "entity": [0] * n,
        "ts": pd.date_range("2024-03-01", periods=n, freq="1h"),
        "x": rng.integers(0, 1000, n),
    })
    pdf.loc[40, "x"] = 10_000   # outlier with plenty of history
    df = spark.createDataFrame(pdf)
    out = (winsorize_pit(df, "entity", "ts", "x", 0.05, 0.95,
                         min_history=20)
           .toPandas().sort_values("event_id")["x_wins"].to_numpy())
    for i in range(n):
        hist = pdf["x"].to_numpy()[:i]          # strictly before
        if len(hist) < 20:
            assert out[i] == pdf["x"][i]
        else:
            lo, hi = np.quantile(hist, [0.05, 0.95])
            assert out[i] == pytest.approx(
                min(max(float(pdf["x"][i]), lo), hi), abs=1e-9)
    assert out[40] < 10_000      # the outlier got clamped


def test_merge_intervals_matches_naive(spark):
    from hiselspark.operators.windows import merge_intervals
    rng = np.random.default_rng(13)
    n = 300
    starts = rng.integers(0, 10_000, n)
    lengths = rng.integers(1, 800, n)
    pdf = pd.DataFrame({
        "iid": range(n),
        "entity": rng.integers(0, 6, n),
        "s": starts,
        "e": starts + lengths,
    })
    out = (merge_intervals(spark.createDataFrame(pdf), "entity", "s",
                           "e", tie_cols=("iid",))
           .toPandas().sort_values(["entity", "island_start"])
           .reset_index(drop=True))
    exp_rows = []
    for ent, g in pdf.groupby("entity"):
        g = g.sort_values(["s", "e", "iid"])
        cur = None
        for _, r in g.iterrows():
            if cur is None or r["s"] > cur[1]:
                if cur is not None:
                    exp_rows.append((ent, cur[0], cur[1], cur[2]))
                cur = [r["s"], r["e"], 1]
            else:
                cur[1] = max(cur[1], r["e"])
                cur[2] += 1
        exp_rows.append((ent, cur[0], cur[1], cur[2]))
    exp = (pd.DataFrame(exp_rows, columns=["entity", "island_start",
                                           "island_end", "n_intervals"])
           .sort_values(["entity", "island_start"])
           .reset_index(drop=True))
    assert len(out) == len(exp)
    for c in ("entity", "island_start", "island_end", "n_intervals"):
        assert (out[c].to_numpy() == exp[c].to_numpy()).all(), c
    # islands are disjoint with real gaps between them
    for ent, g in out.groupby("entity"):
        ends = g["island_end"].to_numpy()[:-1]
        nexts = g["island_start"].to_numpy()[1:]
        assert (nexts > ends).all()


def test_calendar_features_known_values(spark):
    from hiselspark.operators.windows import with_calendar_features
    pdf = pd.DataFrame({
        "event_id": [0, 1],
        # 2024-03-04 is a Monday; 2024-03-09 a Saturday
        "ts": [pd.Timestamp("2024-03-04 13:30:00"),
               pd.Timestamp("2024-03-09 06:00:00")],
    })
    out = (with_calendar_features(spark.createDataFrame(pdf), "ts")
           .toPandas().set_index("event_id"))
    assert out.loc[0, "hour"] == 13 and out.loc[0, "isodow"] == 1
    assert out.loc[0, "is_weekend"] == 0 and out.loc[0, "dom"] == 4
    assert out.loc[1, "isodow"] == 6 and out.loc[1, "is_weekend"] == 1
    for i in (0, 1):
        assert (out.loc[i, "hour_sin"] ** 2
                + out.loc[i, "hour_cos"] ** 2) == pytest.approx(1.0)
        assert (out.loc[i, "dow_sin"] ** 2
                + out.loc[i, "dow_cos"] ** 2) == pytest.approx(1.0)
    assert out.loc[0, "dow_sin"] == pytest.approx(0.0)  # Monday = angle 0
    assert out.loc[0, "dow_cos"] == pytest.approx(1.0)


def test_resample_interp_matches_pandas(spark):
    from hiselspark.operators.resample import resample_interp
    pdf = pd.DataFrame({
        "event_id": range(4),
        "entity": [0, 0, 0, 0],
        "ts": [pd.Timestamp("2024-03-01 00:30"),   # grid 00:00 -> NULL
               pd.Timestamp("2024-03-01 01:30"),
               pd.Timestamp("2024-03-01 04:00"),   # exact grid hit
               pd.Timestamp("2024-03-01 05:30")],
        "x": [100, 200, 500, 900],
    })
    out = (resample_interp(spark.createDataFrame(pdf), "entity", "ts",
                           3600, "x", tie_col="event_id", out_col="v")
           .toPandas().sort_values("grid_ts"))
    got = dict(zip(out["grid_ts"].dt.strftime("%H:%M"), out["v"]))
    assert pd.isna(got["00:00"])          # before first observation
    # 01:00 between (00:30,100) and (01:30,200): half way -> 150
    assert got["01:00"] == pytest.approx(150.0)
    # 02:00 between (01:30,200) and (04:00,500): 30/150 of the way
    assert got["02:00"] == pytest.approx(200 + 300 * (30 / 150))
    assert got["04:00"] == pytest.approx(500.0)   # exact observation
    assert got["05:00"] == pytest.approx(500 + 400 * (60 / 90))


def test_session_features_matches_manual(spark):
    from hiselspark.operators.windows import session_features
    pdf = pd.DataFrame({
        "entity": [0] * 5,
        "ts": [pd.Timestamp("2024-03-01 00:00"),
               pd.Timestamp("2024-03-01 00:10"),
               pd.Timestamp("2024-03-01 01:00"),   # > 30min gap: new
               pd.Timestamp("2024-03-01 01:20"),
               pd.Timestamp("2024-03-01 03:00")],  # new again
        "x": [1, 2, 4, 8, 16],
    })
    out = (session_features(spark.createDataFrame(pdf), "entity", "ts",
                            1800.0, value_col="x")
           .toPandas().sort_values("session_id").reset_index(drop=True))
    assert out["n_events"].tolist() == [2, 2, 1]
    assert out["x_sum"].tolist() == [3, 12, 16]
    assert out["duration_s"].tolist() == [600.0, 1200.0, 0.0]


def test_rolling_slope_matches_numpy(spark, events_pdf):
    from hiselspark.operators.windows import rolling_slope
    win = 4 * 86400.0
    df = spark.createDataFrame(events_pdf)
    out = (rolling_slope(df, "entity", "ts", "x", win)
           .toPandas().set_index("event_id")["roll_slope"])
    for _, row in events_pdf.sample(40, random_state=3).iterrows():
        ent = events_pdf[events_pdf["entity"] == row["entity"]]
        g = ent[(ent["ts"] >= row["ts"] - pd.Timedelta(seconds=win))
                & (ent["ts"] <= row["ts"])]
        got = out.loc[row["event_id"]]
        t = ((g["ts"] - ent["ts"].min()).dt.total_seconds() // 1
             ).to_numpy(dtype=float)
        if len(g) < 2 or np.ptp(t) == 0:
            assert pd.isna(got)
        else:
            b = np.polyfit(t, g["x"].to_numpy(dtype=float), 1)[0]
            assert got == pytest.approx(b, rel=1e-9, abs=1e-12)


def test_time_since_event_matches_manual(spark, events_pdf):
    from hiselspark.operators.windows import time_since_event
    df = spark.createDataFrame(events_pdf)
    cond = F.col("x") % 7 == 0
    out = (time_since_event(df, "entity", "ts", cond, "event_id")
           .toPandas().set_index("event_id")["since_s"])
    for ent, g in events_pdf.groupby("entity"):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        last = None
        for _, row in g.iterrows():
            got = out.loc[row["event_id"]]
            if last is None:
                assert pd.isna(got)
            else:
                want = (row["ts"] - last).total_seconds()
                assert got == pytest.approx(want, abs=1e-9)
            if row["x"] % 7 == 0:
                last = row["ts"]


def test_horizon_lag_matches_manual(spark, events_pdf):
    from hiselspark.operators.windows import horizon_lag
    hz = 2 * 86400.0
    df = spark.createDataFrame(events_pdf)
    out = (horizon_lag(df, "entity", "ts", "x", hz, "event_id",
                       out_col="xh")
           .toPandas().set_index("event_id")["xh"])
    for _, row in events_pdf.sample(60, random_state=5).iterrows():
        ent = events_pdf[events_pdf["entity"] == row["entity"]]
        cand = ent[ent["ts"] <= row["ts"] - pd.Timedelta(seconds=hz)]
        got = out.loc[row["event_id"]]
        if cand.empty:
            assert pd.isna(got)
        else:
            pick = cand.sort_values(["ts", "event_id"]).iloc[-1]
            assert got == pick["x"]


def test_rolling_moments_matches_scipy_formulas(spark, events_pdf):
    from hiselspark.operators.windows import rolling_moments
    win = 4 * 86400.0
    df = spark.createDataFrame(events_pdf)
    out = (rolling_moments(df, "entity", "ts", "x", win)
           .toPandas().set_index("event_id")[["roll_skew", "roll_kurt"]])
    for _, row in events_pdf.sample(50, random_state=11).iterrows():
        ent = events_pdf[events_pdf["entity"] == row["entity"]]
        g = ent[(ent["ts"] >= row["ts"] - pd.Timedelta(seconds=win))
                & (ent["ts"] <= row["ts"])]
        xs = g["x"].to_numpy(dtype=float)
        got = out.loc[row["event_id"]]
        m2 = xs.var()  # population variance
        if len(xs) < 2 or m2 == 0:
            assert pd.isna(got["roll_skew"]) and pd.isna(got["roll_kurt"])
        else:
            c = xs - xs.mean()
            skew = (c ** 3).mean() / m2 ** 1.5
            kurt = (c ** 4).mean() / m2 ** 2 - 3.0
            assert got["roll_skew"] == pytest.approx(skew, abs=1e-7)
            assert got["roll_kurt"] == pytest.approx(kurt, abs=1e-7)


def test_cross_sectional_matches_pandas(spark, events_pdf):
    from hiselspark.operators.windows import cross_sectional_features
    df = spark.createDataFrame(events_pdf)
    out = (cross_sectional_features(df, "ts", "x", bucket="day")
           .toPandas().set_index("event_id"))
    pdf = events_pdf.copy()
    pdf["b"] = pdf["ts"].dt.floor("D")
    g = pdf.groupby("b")["x"]
    pdf["rank"] = g.rank(method="min").astype(int)
    pdf["n"] = g.transform("size")
    pdf["pct"] = (pdf["rank"] - 1) / (pdf["n"] - 1)
    mu = g.transform("mean")
    sd = np.sqrt(g.transform(lambda s: s.var(ddof=0)))
    pdf["z"] = (pdf["x"] - mu) / sd
    for _, row in pdf.iterrows():
        got = out.loc[row["event_id"]]
        assert got["cs_rank"] == row["rank"]
        assert got["cs_pct"] == pytest.approx(row["pct"], abs=1e-12)
        if sd.loc[row.name] == 0:
            assert pd.isna(got["cs_z"])
        else:
            assert got["cs_z"] == pytest.approx(row["z"], abs=1e-9)


def test_rolling_twap_matches_manual(spark, events_pdf):
    from hiselspark.operators.windows import rolling_twap
    win = 2 * 86400.0
    df = spark.createDataFrame(events_pdf)
    out = (rolling_twap(df, "entity", "ts", "x", win, "event_id")
           .toPandas().set_index("event_id")["roll_twap"])
    for _, row in events_pdf.sample(40, random_state=13).iterrows():
        ent = (events_pdf[events_pdf["entity"] == row["entity"]]
               .sort_values(["ts", "event_id"]).reset_index(drop=True))
        ent["dur"] = (ent["ts"].shift(-1) - ent["ts"]).dt.total_seconds()
        g = ent[(ent["ts"] >= row["ts"] - pd.Timedelta(seconds=win))
                & (ent["ts"] <= row["ts"]) & ent["dur"].notna()]
        got = out.loc[row["event_id"]]
        if g.empty or g["dur"].sum() == 0:
            assert pd.isna(got)
        else:
            want = (g["dur"] * g["x"]).sum() / g["dur"].sum()
            assert got == pytest.approx(want, rel=1e-9)


def test_rolling_distinct_matches_bruteforce(spark, events_pdf):
    from hiselspark.operators.chunked import chunked_rolling_distinct
    win = 3 * 86400.0
    pdf = events_pdf.copy()
    pdf["cat"] = (pdf["x"] % 5).astype(str)
    # adversarial tie: two rows at the identical timestamp, distinct
    # values — RANGE semantics must count both for both anchors
    pdf.loc[2, ["entity", "ts"]] = pdf.loc[3, ["entity", "ts"]]
    pdf.loc[2, "cat"] = "tiebreak"
    df = spark.createDataFrame(pdf)
    out = (chunked_rolling_distinct(df, "entity", "ts", "cat", win,
                                    bucket_seconds=4 * 86400.0)
           .toPandas().set_index("event_id")["roll_distinct"])
    assert len(out) == len(pdf)
    for _, row in pdf.sample(60, random_state=17).iterrows():
        ent = pdf[pdf["entity"] == row["entity"]]
        g = ent[(ent["ts"] >= row["ts"] - pd.Timedelta(seconds=win))
                & (ent["ts"] <= row["ts"])]
        assert out.loc[row["event_id"]] == g["cat"].nunique()
    # the tied rows specifically
    for eid in (pdf.loc[2, "event_id"], pdf.loc[3, "event_id"]):
        row = pdf[pdf["event_id"] == eid].iloc[0]
        ent = pdf[pdf["entity"] == row["entity"]]
        g = ent[(ent["ts"] >= row["ts"] - pd.Timedelta(seconds=win))
                & (ent["ts"] <= row["ts"])]
        assert out.loc[eid] == g["cat"].nunique()


def test_rolling_distinct_relational_matches_chunked(spark, events_pdf):
    from hiselspark.operators.chunked import chunked_rolling_distinct
    from hiselspark.operators.windows import rolling_distinct
    win = 3 * 86400.0
    pdf = events_pdf.copy()
    pdf["cat"] = (pdf["x"] % 5).astype(str)
    pdf.loc[2, ["entity", "ts"]] = pdf.loc[3, ["entity", "ts"]]
    pdf.loc[2, "cat"] = "tiebreak"
    df = spark.createDataFrame(pdf)
    rel = (rolling_distinct(df, "entity", "ts", "cat", win, "event_id")
           .toPandas().set_index("event_id")["roll_distinct"]
           .sort_index())
    chk = (chunked_rolling_distinct(df, "entity", "ts", "cat", win,
                                    bucket_seconds=4 * 86400.0)
           .toPandas().set_index("event_id")["roll_distinct"]
           .sort_index())
    pd.testing.assert_series_equal(rel, chk, check_dtype=False)
    for _, row in pdf.sample(40, random_state=23).iterrows():
        ent = pdf[pdf["entity"] == row["entity"]]
        g = ent[(ent["ts"] >= row["ts"] - pd.Timedelta(seconds=win))
                & (ent["ts"] <= row["ts"])]
        assert rel.loc[row["event_id"]] == g["cat"].nunique()


def test_funnel_steps_matches_bruteforce(spark, events_pdf):
    from hiselspark.operators.windows import funnel_steps
    pdf = events_pdf.copy()
    pdf["kind"] = (pdf["x"] % 3).map({0: "a", 1: "b", 2: "c"})
    df = spark.createDataFrame(pdf)
    out = (funnel_steps(df, "entity", "ts",
                        [F.col("kind") == "a", F.col("kind") == "b",
                         F.col("kind") == "c"], "event_id")
           .toPandas().set_index("entity"))
    for ent, g in pdf.groupby("entity"):
        g = g.sort_values("ts")
        t1 = g.loc[g["kind"] == "a", "ts"].min()
        t2 = (g.loc[(g["kind"] == "b") & (g["ts"] > t1), "ts"].min()
              if pd.notna(t1) else pd.NaT)
        t3 = (g.loc[(g["kind"] == "c") & (g["ts"] > t2), "ts"].min()
              if pd.notna(t2) else pd.NaT)
        row = out.loc[ent]
        for want, gotcol in ((t1, "step1_us"), (t2, "step2_us"),
                             (t3, "step3_us")):
            if pd.isna(want):
                assert pd.isna(row[gotcol])
            else:
                assert int(row[gotcol]) == want.value // 1000
        assert row["funnel_depth"] == sum(pd.notna(t)
                                          for t in (t1, t2, t3))


def test_rolling_mad_matches_numpy_and_flags_outlier(spark):
    from hiselspark.operators.windows import rolling_mad
    rng = np.random.default_rng(11)
    n = 120
    ts = pd.date_range("2024-03-01", periods=n, freq="7min")
    x = rng.integers(90, 110, size=n).astype(float)
    x[80] = 500.0  # planted spike
    pdf = pd.DataFrame({"e": ["a"] * n, "ts": ts, "x": x,
                        "i": range(n)})
    out = (rolling_mad(spark.createDataFrame(pdf), "e", "ts", "x",
                       window_seconds=3600.0)
           .toPandas().sort_values("i").reset_index(drop=True))
    # numpy twin: trailing 1h (inclusive) window per row
    secs = (ts - ts[0]).total_seconds().to_numpy()
    for i in range(n):
        w = x[(secs >= secs[i] - 3600.0) & (secs <= secs[i])]
        med = np.quantile(w, 0.5)
        mad = np.quantile(np.abs(w - med), 0.5)
        assert out.loc[i, "roll_med"] == pytest.approx(med, abs=1e-9)
        assert out.loc[i, "roll_mad"] == pytest.approx(mad, abs=1e-9)
        if mad > 0:
            assert out.loc[i, "robust_z"] == pytest.approx(
                (x[i] - med) / (1.4826 * mad), rel=1e-12)
        else:
            assert pd.isna(out.loc[i, "robust_z"])
    # the spike is loudly flagged; its neighbors are not dragged
    assert out.loc[80, "robust_z"] > 10
    assert out.loc[79, "robust_z"] is not None
    assert abs(out.loc[81, "robust_z"]) < 5  # median/MAD resist the spike


def test_cusum_closed_form_equals_recursion(spark):
    from hiselspark.operators.windows import cusum
    rng = np.random.default_rng(23)
    n = 300
    x = rng.integers(80, 121, size=n).astype(float)
    x[150:200] += 30  # planted upward mean shift
    x[250:] -= 40     # and a downward one
    ts = pd.date_range("2024-05-01", periods=n, freq="3min")
    pdf = pd.DataFrame({"e": ["u"] * n, "ts": ts, "x": x,
                        "i": range(n)})
    out = (cusum(spark.createDataFrame(pdf), "e", "ts", "x",
                 target=100.0, slack=5.0, tiebreak=("i",))
           .toPandas().sort_values("i").reset_index(drop=True))
    sp = sn = 0.0
    for i in range(n):
        sp = max(0.0, sp + (x[i] - 105.0))
        sn = max(0.0, sn + (95.0 - x[i]))
        assert out.loc[i, "cusum_pos"] == pytest.approx(sp, abs=1e-9)
        assert out.loc[i, "cusum_neg"] == pytest.approx(sn, abs=1e-9)
    # the statistics actually fire where the shifts were planted
    assert out.loc[199, "cusum_pos"] > 500
    assert out.loc[299, "cusum_neg"] > 500
    assert out.loc[149, "cusum_pos"] < 200


def test_rolling_rank_and_drawdown_match_numpy(spark):
    from hiselspark.operators.windows import (rolling_rank,
                                              running_drawdown)
    rng = np.random.default_rng(31)
    n = 150
    ts = pd.date_range("2024-06-01", periods=n, freq="11min")
    x = rng.integers(0, 1000, size=n)
    pdf = pd.DataFrame({"e": ["a"] * n, "ts": ts, "x": x,
                        "i": range(n)})
    sdf = spark.createDataFrame(pdf)
    rr = (rolling_rank(sdf, "e", "ts", "x", 3600.0, out_col="rr")
          .toPandas().sort_values("i").reset_index(drop=True))
    dd = (running_drawdown(sdf, "e", "ts", "x", tiebreak=("i",))
          .toPandas().sort_values("i").reset_index(drop=True))
    secs = (ts - ts[0]).total_seconds().to_numpy()
    peak = np.maximum.accumulate(x)
    for i in range(n):
        w = x[(secs >= secs[i] - 3600.0) & (secs <= secs[i])]
        assert rr.loc[i, "rr"] == pytest.approx(
            np.mean(w <= x[i]), abs=1e-12)
        assert dd.loc[i, "run_peak"] == peak[i]
        assert dd.loc[i, "drawdown"] == pytest.approx(
            (peak[i] - x[i]) / peak[i], abs=1e-12)


def test_ohlc_bars_matches_pandas_resample(spark):
    from hiselspark.operators.resample import ohlc_bars
    rng = np.random.default_rng(41)
    n = 500
    pdf = pd.DataFrame({
        "e": rng.integers(0, 5, n).astype(str),
        "ts": pd.Timestamp("2024-02-01")
        + pd.to_timedelta(rng.integers(0, 10 * 86400, n), unit="s"),
        "x": rng.integers(-100, 1000, n),
        "i": np.arange(n),
    })
    out = (ohlc_bars(spark.createDataFrame(pdf), "e", "ts", "x",
                     3600, tiebreak=("i",))
           .toPandas().set_index(["e", "bar_start"]).sort_index())
    pdf = pdf.sort_values(["ts", "i"])
    for (e, g) in pdf.groupby("e"):
        r = g.set_index("ts")["x"].resample("1h").ohlc().dropna()
        s = g.set_index("ts")["x"].resample("1h")
        agg = pd.DataFrame({"n": s.count(), "total": s.sum()})
        for t, row in r.iterrows():
            key = (e, int(t.timestamp()))
            got = out.loc[key]
            assert got["open"] == row["open"]
            assert got["high"] == row["high"]
            assert got["low"] == row["low"]
            assert got["close"] == row["close"]
            assert got["n"] == agg.loc[t, "n"]
            assert got["total"] == agg.loc[t, "total"]
    assert len(out) == sum(
        len(g.set_index("ts")["x"].resample("1h").ohlc().dropna())
        for _, g in pdf.groupby("e"))


def test_woe_encode_known_values_and_iv(spark):
    from hiselspark.operators.encoding import woe_encode
    pdf = pd.DataFrame({
        "cat": ["a"] * 60 + ["b"] * 40 + ["c"] * 10,
        "y": [1] * 45 + [0] * 15 + [1] * 5 + [0] * 35 + [0] * 10,
    })
    out = (woe_encode(spark.createDataFrame(pdf), "cat", "y", alpha=0.5)
           .toPandas().set_index("cat"))
    POS, NEG = 50, 60
    for c in "abc":
        pos = int(((pdf.cat == c) & (pdf.y == 1)).sum())
        neg = int(((pdf.cat == c) & (pdf.y == 0)).sum())
        p = (pos + 0.5) / (POS + 1.0)
        q = (neg + 0.5) / (NEG + 1.0)
        assert out.loc[c, "pos"] == pos and out.loc[c, "neg"] == neg
        assert out.loc[c, "woe"] == pytest.approx(np.log(p / q))
        assert out.loc[c, "iv"] == pytest.approx((p - q) * np.log(p / q))
    # over-indexing category positive, under-indexing negative; IV >= 0
    assert out.loc["a", "woe"] > 0 > out.loc["b", "woe"]
    assert (out["iv"] >= 0).all()


def test_seasonal_baseline_strictly_before_same_phase(spark):
    from hiselspark.operators.windows import seasonal_baseline
    rng = np.random.default_rng(53)
    n = 400
    ts = (pd.Timestamp("2024-01-01")
          + pd.to_timedelta(rng.integers(0, 28 * 86400, n), unit="s"))
    pdf = pd.DataFrame({"e": rng.integers(0, 3, n).astype(str),
                        "ts": ts,
                        "x": rng.integers(0, 100, n),
                        "i": np.arange(n)})
    out = (seasonal_baseline(spark.createDataFrame(pdf), "e", "ts",
                             "x", 168)
           .toPandas().sort_values("i").reset_index(drop=True))
    pdf = pdf.sort_values("i").reset_index(drop=True)
    us = (pdf.ts.astype("int64") // 1000).to_numpy()
    phase = (us // 3_600_000_000) % 168
    for i in range(n):
        mask = ((pdf.e == pdf.e[i]) & (phase == phase[i])
                & (us < us[i]))
        if mask.any():
            assert out.loc[i, "seasonal_base"] == pytest.approx(
                pdf.x[mask].mean(), abs=1e-9)
            assert out.loc[i, "seasonal_resid"] == pytest.approx(
                pdf.x[i] - pdf.x[mask].mean(), abs=1e-9)
        else:
            assert pd.isna(out.loc[i, "seasonal_base"])


def test_expanding_ols_resid_strictly_before(spark):
    from hiselspark.operators.windows import expanding_ols_resid
    rng = np.random.default_rng(67)
    n = 120
    ts = pd.date_range("2024-07-01", periods=n, freq="2h")
    x = np.arange(n)
    y = 3 * x + 50 + rng.integers(-4, 5, n)
    pdf = pd.DataFrame({"e": "u", "ts": ts, "x": x, "y": y,
                        "i": range(n)})
    out = (expanding_ols_resid(spark.createDataFrame(pdf), "e", "ts",
                               "x", "y")
           .toPandas().sort_values("i").reset_index(drop=True))
    # rows 0 and 1 have <2 prior rows -> NULL
    assert pd.isna(out.loc[0, "ols_pred"]) and pd.isna(out.loc[1, "ols_pred"])
    for i in (2, 10, 60, n - 1):
        sl, ic = np.polyfit(x[:i], y[:i], 1)  # strictly-before fit
        pred = ic + sl * x[i]
        assert out.loc[i, "ols_pred"] == pytest.approx(pred, abs=1e-6)
        assert out.loc[i, "ols_resid"] == pytest.approx(y[i] - pred,
                                                        abs=1e-6)
    # residuals are de-trended: mean |resid| far below mean |y - ybar|
    r = out.ols_resid.iloc[5:].abs().mean()
    assert r < 10  # noise scale, not trend scale (~170)


def test_rolling_entropy_matches_numpy(spark):
    from hiselspark.operators.windows import rolling_entropy
    rng = np.random.default_rng(73)
    n = 200
    ts = pd.date_range("2024-08-01", periods=n, freq="13min")
    cats = rng.choice(["a", "b", "c"], n, p=[0.6, 0.3, 0.1])
    cats[:40] = "a"  # a monotone prefix: entropy 0 there
    pdf = pd.DataFrame({"e": "u", "ts": ts, "c": cats, "i": range(n)})
    out = (rolling_entropy(spark.createDataFrame(pdf), "e", "ts", "c",
                           3600.0, categories=["a", "b", "c"])
           .toPandas().sort_values("i").reset_index(drop=True))
    secs = (ts - ts[0]).total_seconds().to_numpy()
    for i in range(n):
        w = cats[(secs >= secs[i] - 3600.0) & (secs <= secs[i])]
        ps = np.array([np.mean(w == c) for c in "abc"])
        want = -sum(p * np.log(p) for p in ps if p > 0)
        assert out.loc[i, "roll_entropy"] == pytest.approx(want,
                                                           abs=1e-12)
    assert out.loc[10, "roll_entropy"] == 0.0  # single-category window
    assert out.roll_entropy.max() <= np.log(3) + 1e-12
    # the window also reuses the single entity clustering
    from tests.test_plans import n_exchanges
    df2 = rolling_entropy(spark.createDataFrame(pdf), "e", "ts", "c",
                          3600.0, categories=["a", "b", "c"])
    assert n_exchanges(df2) == 1


def test_session_paths_known_sessions(spark):
    from hiselspark.operators.windows import session_paths
    t0 = pd.Timestamp("2024-09-01")
    rows = []
    # user 1: two sessions, both view>click>purchase
    for s, start in enumerate([0, 7200]):
        for j, st in enumerate(["view", "click", "purchase"]):
            rows.append((1, t0 + pd.Timedelta(seconds=start + j * 60),
                         st, len(rows)))
    # user 2: one long session view>click>view>click>view (truncates)
    for j, st in enumerate(["view", "click", "view", "click", "view"]):
        rows.append((2, t0 + pd.Timedelta(seconds=j * 60), st,
                     len(rows)))
    pdf = pd.DataFrame(rows, columns=["u", "ts", "s", "i"])
    out = (session_paths(spark.createDataFrame(pdf), "u", "ts", "s",
                         gap_seconds=1800.0, max_len=4,
                         tiebreak=("i",))
           .toPandas().set_index("path"))
    assert out.loc["view>click>purchase", "n_sessions"] == 2
    assert out.loc["view>click>purchase", "n_entities"] == 1
    # truncated to first 4 states
    assert out.loc["view>click>view>click", "n_sessions"] == 1
    assert len(out) == 2


def test_crossover_events_hand_case(spark):
    from hiselspark.operators.windows import crossover_events
    t0 = pd.Timestamp("2024-10-01")
    # fast/slow sequences engineered for one up-cross then one down
    fast = [1, 3, 5, 4, 2, 1, 3]
    slow = [2, 2, 3, 3, 3, 2, 2]
    pdf = pd.DataFrame({
        "e": "u",
        "ts": [t0 + pd.Timedelta(minutes=i) for i in range(7)],
        "f": fast, "s": slow, "i": range(7),
    })
    out = (crossover_events(spark.createDataFrame(pdf), "e", "ts",
                            "f", "s", tiebreak=("i",))
           .toPandas().sort_values("i").reset_index(drop=True))
    # above: 0,1,1,1,0,0,1 -> up at rows 1 and 6, down at row 4
    assert list(out.cross_up) == [0, 1, 0, 0, 0, 0, 1]
    assert list(out.cross_down) == [0, 0, 0, 0, 1, 0, 0]


def test_ks_statistic_matches_brute_force(spark):
    from hiselspark.operators.drift import ks_statistic
    rng = np.random.default_rng(7)
    a = rng.integers(0, 100, 1500)          # reference
    b = rng.integers(20, 120, 1000)         # shifted current
    pdf = pd.DataFrame({"v": np.concatenate([a, b]),
                        "is_ref": [1] * len(a) + [0] * len(b)})
    row = ks_statistic(spark.createDataFrame(pdf), "v",
                       F.col("is_ref") == 1).collect()[0]
    # brute-force sup of the ECDF gap over all observed values
    vals = np.unique(pdf.v)
    fa = np.array([(a <= v).mean() for v in vals])
    fb = np.array([(b <= v).mean() for v in vals])
    want = np.abs(fa - fb).max()
    assert row["ks"] == pytest.approx(want, abs=1e-12)
    assert row["n_ref"] == len(a) and row["n_cur"] == len(b)
    at = row["at_value"]
    assert abs((a <= at).mean() - (b <= at).mean()) == pytest.approx(
        want, abs=1e-12)
    # identical samples -> KS == 0
    same = pd.DataFrame({"v": np.tile(a, 2),
                         "is_ref": [1] * len(a) + [0] * len(a)})
    z = ks_statistic(spark.createDataFrame(same), "v",
                     F.col("is_ref") == 1).collect()[0]
    assert z["ks"] == 0.0


def test_rolling_entropy_caps_unbounded_domain(spark):
    # the categories=None fallback must refuse to collect an
    # unbounded category domain to the driver
    from hiselspark.operators.windows import rolling_entropy
    n = 50
    ts = pd.date_range("2024-08-01", periods=n, freq="1min")
    pdf = pd.DataFrame({"e": "u", "ts": ts,
                        "c": [f"cat{i}" for i in range(n)]})
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="max_categories"):
        rolling_entropy(df, "e", "ts", "c", 3600.0, max_categories=8)
    # an explicit domain or a big-enough cap still works
    out = rolling_entropy(df, "e", "ts", "c", 3600.0,
                          max_categories=64)
    assert out.count() == n
