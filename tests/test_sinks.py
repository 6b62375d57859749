"""Training-shard sink: deterministic content-keyed sharding, bounded
file sizes, manifest lineage, exact write->read round trip."""
import glob

import pandas as pd

from hiselspark.sinks import read_training_shards, write_training_shards


def _docs(n=120):
    return pd.DataFrame({
        "doc_id": range(n),
        "text": [f"document number {i % 40} body text" for i in range(n)],
    })


def test_round_trip_and_manifest(spark, tmp_path):
    path = str(tmp_path / "shards")
    df = spark.createDataFrame(_docs()).repartition(5)
    manifest = write_training_shards(df, path, n_shards=4,
                                     max_records_per_file=10).toPandas()
    back = read_training_shards(spark, path)
    assert back.count() == 120
    # manifest counts equal the read-back per-shard counts
    got = (back.groupBy("shard").count().toPandas()
           .astype({"shard": int}).set_index("shard")["count"])
    exp = manifest.set_index("shard")["n_rows"]
    assert got.sort_index().to_dict() == exp.sort_index().to_dict()
    # file sizes bounded: no file holds more than max_records_per_file
    for f in glob.glob(f"{path}/shard=*/*.parquet"):
        assert spark.read.parquet(f).count() <= 10, f


def test_duplicates_colocate_and_layout_independence(spark, tmp_path):
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    df = spark.createDataFrame(_docs())
    write_training_shards(df.repartition(2), pa, n_shards=8)
    write_training_shards(df.repartition(13), pb, n_shards=8)
    a = read_training_shards(spark, pa).toPandas()
    b = read_training_shards(spark, pb).toPandas()
    # same text -> same shard, regardless of input partitioning
    ash = a.set_index("doc_id")["shard"].astype(int)
    bsh = b.set_index("doc_id")["shard"].astype(int)
    assert ash.sort_index().to_dict() == bsh.sort_index().to_dict()
    per_text = a.groupby("text")["shard"].nunique()
    assert (per_text == 1).all()


def test_csv_jsonl_roundtrip_hostile_strings(spark, tmp_path):
    """CSV and JSONL round trips must preserve strings with embedded
    commas, quotes, unicode and empty values, exact longs, doubles
    and microsecond timestamps."""
    import datetime as dt
    from hiselspark.sources.textfiles import (read_csv, read_jsonl,
                                              write_csv, write_jsonl)
    rows = [
        (1, 'a,b,"c" d', 3.14159, dt.datetime(2024, 1, 2, 3, 4, 5,
                                              123456)),
        (2, '{"k": "v, w", "n": [1,2]}', -0.5,
         dt.datetime(2024, 6, 30, 23, 59, 59, 999999)),
        (3, "", 1e300, dt.datetime(1999, 12, 31)),
        (4, "naïve — déjà vu ✓", 0.0, dt.datetime(2024, 2, 29)),
    ]
    df = spark.createDataFrame(
        rows, "id long, s string, x double, ts timestamp")
    want = sorted(map(tuple, df.collect()))
    p_csv, p_json = str(tmp_path / "c"), str(tmp_path / "j")
    write_csv(df, p_csv)
    write_jsonl(df, p_json)
    got_csv = sorted(map(tuple,
                         read_csv(spark, p_csv, df.schema).collect()))
    got_json = sorted(map(tuple, read_jsonl(spark, p_json,
                                            df.schema).collect()))
    # CSV writes empty string as "" with quoteAll; Spark reads the
    # empty field back as NULL unless told otherwise — accept the
    # documented NULL-vs-empty CSV ambiguity, everything else exact
    def norm(ts):
        return [tuple("" if v is None else v for v in r) for r in ts]
    assert norm(got_csv) == norm(want)
    assert got_json == want
