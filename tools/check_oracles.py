"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
the given sf, compare row count / schema / order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [name ...]

Float columns are compared REPRESENTATION-EXACT by default (signbit-
aware ``repr`` equality — the same bar as the driver's value hash,
which distinguishes ``-0.0`` from ``0.0``).  Round 3 shipped with an
rtol=1e-9 compare here and the committed artifact said 307/307 while
the driver's hash flagged ``pit_ols``; the tolerant compare survives
only behind ``CHECK_ORACLES_TOLERANT=1`` for diagnosis.

With ``CHECK_ORACLES_JSON=/path/out.json`` set, a per-query artifact
(status / row counts / problems) is also written — committed per round
as ``CHECK_FULL_r{N}.json`` so the judge can diff the FULL gate result
instead of re-running it (the driver itself samples ~50 queries).
"""
from __future__ import annotations

import os
import sys

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# diagnosis-only escape hatch; the committed artifact must be produced
# with the representation-exact default
TOLERANT = os.environ.get("CHECK_ORACLES_TOLERANT", "") == "1"


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return (df.sort_values(list(df.columns))
              .reset_index(drop=True))


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list:
    problems = []
    if len(got) != len(exp):
        problems.append(f"rowcount spark={len(got)} duckdb={len(exp)}")
    if sorted(got.columns) != sorted(exp.columns):
        problems.append(f"columns spark={sorted(got.columns)} "
                        f"duckdb={sorted(exp.columns)}")
        return problems
    g, e = normalize(got), normalize(exp)
    if len(g) == len(e):
        for c in g.columns:
            gv, ev = g[c], e[c]
            # the driver's value-hash is representation-exact: an int64
            # column on one side vs float64 on the other (e.g. DuckDB
            # HUGEINT -> float64) hashes differently even when every
            # value is numerically equal — flag it here too
            g_float = pd.api.types.is_float_dtype(gv)
            e_float = pd.api.types.is_float_dtype(ev)
            g_int = pd.api.types.is_integer_dtype(gv)
            e_int = pd.api.types.is_integer_dtype(ev)
            if (g_float and e_int) or (g_int and e_float):
                problems.append(
                    f"dtype family mismatch in column {c}: "
                    f"spark={gv.dtype} duckdb={ev.dtype} "
                    f"(driver value-hash would differ)")
                continue
            if g_float or e_float:
                gv = pd.to_numeric(gv, errors="coerce").astype(float)
                ev = pd.to_numeric(ev, errors="coerce").astype(float)
                if TOLERANT:
                    both_nan = gv.isna() & ev.isna()
                    close = np.isclose(gv.fillna(0), ev.fillna(0),
                                       rtol=1e-9, atol=1e-12)
                    ok = (both_nan
                          | (close & (gv.isna() == ev.isna()))).all()
                    bad_mask = ~(both_nan
                                 | (close & (gv.isna() == ev.isna())))
                else:
                    # representation-exact, like the driver's hash:
                    # repr() distinguishes -0.0 from 0.0 and treats
                    # NaN==NaN ('nan' == 'nan')
                    gr = gv.map(repr)
                    er = ev.map(repr)
                    bad_mask = (gr != er)
                    ok = not bad_mask.any()
            else:
                bad_mask = gv.astype(str) != ev.astype(str)
                ok = not bad_mask.any()
            if not ok:
                bad = bad_mask.to_numpy().nonzero()[0][:3]
                problems.append(
                    f"values differ in column {c}; first rows {bad.tolist()}: "
                    f"spark={gv.iloc[bad].tolist()} duckdb={ev.iloc[bad].tolist()}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as se
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "16g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    # bound the oracle engine: DuckDB's default limit (80% of RAM)
    # ignores the 16g Spark JVM sharing the box — at sf0.1 the two
    # briefly exhausted physical memory (tiny-allocation OOMs in the
    # heavier CTE-materializing oracles).  48G + disk spill keeps the
    # sweep safe at any sf
    con.execute("SET memory_limit='48GB'")
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = se.queries()
    oracles = se.oracle_sql()
    failures = 0
    report = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark query raised {exc!r}")
            report[name] = {"status": "fail",
                            "err": f"spark query raised {exc!r}"}
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows)")
            report[name] = {"status": "rows_only", "spark_rows": len(got)}
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {exc!r}")
            report[name] = {"status": "fail",
                            "err": f"oracle raised {exc!r}"}
            failures += 1
            continue
        problems = compare(name, got, exp)
        if problems:
            failures += 1
            print(f"FAIL {name}: " + " | ".join(problems))
            report[name] = {"status": "fail", "spark_rows": len(got),
                            "oracle_rows": len(exp),
                            "problems": problems}
        else:
            print(f"ok   {name}: {len(got)} rows match")
            report[name] = {"status": "ok", "spark_rows": len(got),
                            "oracle_rows": len(exp)}
    print(f"\n{failures} failures")
    out_json = os.environ.get("CHECK_ORACLES_JSON")
    if out_json:
        import json
        with open(out_json, "w") as f:
            json.dump({"sf_dir": sf_dir,
                       "n_queries": len(report),
                       "n_failures": failures,
                       "queries": report}, f, indent=1, sort_keys=True)
        print(f"wrote {out_json}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
