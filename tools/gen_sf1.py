#!/usr/bin/env python3
"""Generate an sf1 test dir by deterministic 10x replication of sf0.1.

The driver ships sf0.001/0.01/0.1 (TESTDATA.md, read-only); the r19
verdict's item 4 asks for a correctness sweep one decade above the
largest shipped dir. This generator builds that decade REPRODUCIBLY
(committed here — the r19 plan-ledger lesson: an artifact without its
generator is not evidence): each table is 10 copies of its sf0.1 self
with every join key offset by copy*stride (strides = the dense 0..N-1
key ranges of sf0.1, so FK edges stay internally consistent per copy
and never collide across copies), nation/region kept single (fixed
dims), timestamps and dates untouched (every month-cutoff/growth-ratio
convention the p4x stats family derives from the calendar is
preserved), document text perturbed with a per-copy suffix token
(10 identical copies of every document would turn the dedup family's
"corpus has no exact dups" regime into 10-way dup clusters — a
DIFFERENT corpus, not a bigger one) with n_chars recomputed, and
embedding vectors nudged by copy/1024 (exact in float32) in their
first component so ANN similarity ties stay as rare as the original
corpus's. Output types are cast back to the sf0.1 parquet schema
exactly (int32 dims stay int32, embeddings stay FLOAT[]).

Usage: python3 tools/gen_sf1.py [outdir]   (default /tmp/graft_sf1)
DuckDB only — the driver-side toolchain check.py already uses.
"""
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
COPIES = 10

# dense 0..N-1 key ranges of sf0.1 (asserted below)
STRIDE = {
    "customer": 15_000, "orders": 150_000, "part": 20_000,
    "supplier": 1_000, "documents": 5_000, "events": 100_000,
    "user": 1_500,
}


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW i AS SELECT unnest(range({COPIES})) AS i")

    # assert the stride assumptions still describe the source dir
    for t, k, s in [("customer", "c_custkey", 15_000),
                    ("orders", "o_orderkey", 150_000),
                    ("part", "p_partkey", 20_000),
                    ("supplier", "s_suppkey", 1_000),
                    ("documents", "doc_id", 5_000),
                    ("events", "event_id", 100_000)]:
        lo, hi, n = con.execute(
            f"SELECT min({k}), max({k}), count(*) FROM '{SRC}/{t}.parquet'"
        ).fetchone()
        assert (lo, hi, n) == (0, s - 1, s), (t, lo, hi, n)

    def gen(table, select):
        con.execute(
            f"COPY (SELECT {select} FROM '{SRC}/{table}.parquet' CROSS JOIN i"
            f" ORDER BY 1) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    c, o, p, s, d, e, u = (STRIDE["customer"], STRIDE["orders"],
                           STRIDE["part"], STRIDE["supplier"],
                           STRIDE["documents"], STRIDE["events"],
                           STRIDE["user"])

    gen("customer",
        f"c_custkey + i*{c} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment")
    gen("orders",
        f"o_orderkey + i*{o} AS o_orderkey, o_custkey + i*{c} AS o_custkey,"
        " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
    gen("lineitem",
        f"l_orderkey + i*{o} AS l_orderkey, l_partkey + i*{p} AS l_partkey,"
        f" l_suppkey + i*{s} AS l_suppkey, l_linenumber, l_quantity,"
        " l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
        " l_shipdate")
    gen("part",
        f"p_partkey + i*{p} AS p_partkey, p_name, p_brand, p_type, p_size,"
        " p_retailprice")
    gen("supplier",
        f"s_suppkey + i*{s} AS s_suppkey, s_name, s_nationkey, s_acctbal")
    gen("events",
        f"event_id + i*{e} AS event_id, ts, user_id + i*{u} AS user_id,"
        " event_type, value, props")
    gen("documents",
        f"doc_id + i*{d} AS doc_id,"
        " CASE WHEN i = 0 THEN text ELSE text || ' c' || i END AS text,"
        " lang, source,"
        " CAST(length(CASE WHEN i = 0 THEN text ELSE text || ' c' || i END)"
        "  AS BIGINT) AS n_chars")
    gen("embeddings",
        f"vec_id + i*{d} AS vec_id,"
        " CASE WHEN i = 0 THEN embedding ELSE"
        "  list_value(CAST(embedding[1] + i/1024.0 AS FLOAT)) || embedding[2:]"
        " END AS embedding, label")
    for t in ("nation", "region"):
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet')"
                    f" TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")

    # schema parity with the source dir
    import pyarrow.parquet as pq
    for t in ("customer", "orders", "lineitem", "part", "supplier",
              "events", "documents", "embeddings", "nation", "region"):
        a = pq.read_schema(f"{SRC}/{t}.parquet")
        b = pq.read_schema(f"{OUT}/{t}.parquet")
        got = {n: str(ty) for n, ty in zip(b.names, b.types)}
        want = {n: str(ty) for n, ty in zip(a.names, a.types)}
        assert got == want, (t, want, got)
    print("schemas match sf0.1; done ->", OUT)


if __name__ == "__main__":
    main()
