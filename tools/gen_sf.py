"""Deterministic N-fold scale-up of a driver testdata directory.

The driver ships sf0.001/sf0.01/sf0.1; the round-5 scale proof wants
an order of magnitude more (VERDICT round 4, item 2).  The driver's
own generator is not in this repo and ``/root/testdata`` is
read-only, so this tool synthesizes an sf1-sized dataset as a pure
deterministic function of sf0.1: ``factor`` id-offset copies of every
fact table, foreign keys offset consistently (customer/orders/
lineitem/part/supplier/events/documents/embeddings), dimension tables
(region, nation) kept as-is.  Copy 0 is byte-identical to the
source, so every "probe id < 20"-style gate anchor still exists.

Two deliberate decorrelations keep the scaled data from being a
degenerate 10x duplicate blob (which would quadratically explode the
dedup/ANN workloads instead of scaling them linearly):

* ``documents.text`` of copy k is ROTATED by ``k*37`` characters
  (same length — ``n_chars`` stays consistent — same character
  distribution, disjoint shingle sets across copies, and the planted
  within-copy duplicate structure is preserved in every copy);
* ``embeddings.embedding`` of copy k is cyclically ROLLED by ``k``
  positions (same norm, same value distribution, copies decorrelated
  so ANN top-k is not "find your own 9 clones").

Correctness at the new scale is untouched by any of this: the gate
compares Spark against DuckDB ON THE SAME PARQUET, whoever generated
it.  Output rows are explicitly ordered (copy, primary key) so the
generated files are bit-reproducible.

Usage: python tools/gen_sf.py [src_dir] [out_dir] [factor]
       defaults: /root/testdata/sf0.1 /tmp/hiselspark_sfgen/sf1 10
"""
from __future__ import annotations

import os
import sys

import duckdb


def generate(src: str, out: str, factor: int = 10) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=true")

    def copy(table: str, select: str, order: str) -> None:
        path = f"{out}/{table}.parquet"
        con.execute(
            f"COPY (SELECT {select} FROM "
            f"read_parquet('{src}/{table}.parquet'), "
            f"range({factor}) t(k) ORDER BY {order}) "
            f"TO '{path}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{path}')").fetchone()[0]
        print(f"{table}: {n} rows -> {path}", flush=True)

    def passthrough(table: str) -> None:
        path = f"{out}/{table}.parquet"
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')) "
            f"TO '{path}' (FORMAT PARQUET)")
        print(f"{table}: passthrough -> {path}", flush=True)

    def max1(table: str, col: str) -> int:
        return int(con.execute(
            f"SELECT max({col}) + 1 FROM "
            f"read_parquet('{src}/{table}.parquet')").fetchone()[0])

    ck = max1("customer", "c_custkey")
    sk = max1("supplier", "s_suppkey")
    pk = max1("part", "p_partkey")
    ok = max1("orders", "o_orderkey")
    ek = max1("events", "event_id")
    uk = max1("events", "user_id")
    dk = max1("documents", "doc_id")
    vk = max1("embeddings", "vec_id")

    passthrough("region")
    passthrough("nation")
    copy("customer",
         f"c_custkey + k*{ck} AS c_custkey, c_name, c_nationkey, "
         f"c_acctbal, c_mktsegment", "k, c_custkey")
    copy("supplier",
         f"s_suppkey + k*{sk} AS s_suppkey, s_name, s_nationkey, "
         f"s_acctbal", "k, s_suppkey")
    copy("part",
         f"p_partkey + k*{pk} AS p_partkey, p_name, p_brand, p_type, "
         f"p_size, p_retailprice", "k, p_partkey")
    copy("orders",
         f"o_orderkey + k*{ok} AS o_orderkey, "
         f"o_custkey + k*{ck} AS o_custkey, o_orderstatus, "
         f"o_totalprice, o_orderdate, o_orderpriority",
         "k, o_orderkey")
    copy("lineitem",
         f"l_orderkey + k*{ok} AS l_orderkey, "
         f"l_partkey + k*{pk} AS l_partkey, "
         f"l_suppkey + k*{sk} AS l_suppkey, l_linenumber, l_quantity, "
         f"l_extendedprice, l_discount, l_tax, l_returnflag, "
         f"l_linestatus, l_shipdate", "k, l_orderkey, l_linenumber")
    copy("events",
         f"event_id + k*{ek} AS event_id, ts, "
         f"user_id + k*{uk} AS user_id, event_type, value, props",
         "k, event_id")
    copy("documents",
         f"doc_id + k*{dk} AS doc_id, "
         f"substr(text, (k*37 % greatest(len(text), 1)) + 1) || "
         f"substr(text, 1, k*37 % greatest(len(text), 1)) AS text, "
         f"lang, source, n_chars", "k, doc_id")
    copy("embeddings",
         f"vec_id + k*{vk} AS vec_id, "
         f"CAST(list_transform(range(len(embedding)), "
         f"i -> embedding[((i + k) % len(embedding)) + 1]) "
         f"AS FLOAT[]) AS embedding, label", "k, vec_id")
    con.close()


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/hiselspark_sfgen/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    generate(src, out, factor)
