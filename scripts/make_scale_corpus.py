#!/usr/bin/env python3
"""Replicate-and-perturb a testdata SF directory to COPIES x its size.

Scale-evidence harness (round-9): builds an sf1-equivalent corpus from
sf0.1 so the heaviest catalog queries can be timed at two scales and
their empirical scaling exponents recorded in SCALE.md. Structure is
preserved per copy, cross-copy collisions are broken:

- relational keys shift by copy * STRIDE (the trade graph keeps its
  25-nation node set -- aggregated entity graphs do not grow with fact
  volume -- while the co-occurrence graph grows 10x in nodes and edges,
  one disconnected component family per copy, matching how disjoint
  tenants/corpora compose in production);
- document text gets a per-copy suffix on EVERY token (copy 0 stays
  pristine): within-copy token/shingle structure -- and therefore
  near-dup pair structure -- is preserved exactly, while cross-copy
  shingle overlap drops to zero, so dedup work scales with corpus size
  instead of exploding quadratically in artificial cross-copy twins;
- embeddings get a tiny deterministic per-copy offset (breaks exact
  duplication without moving the distribution).

Usage: make_scale_corpus.py SRC_DIR DST_DIR [COPIES]
"""
import sys

import duckdb

STRIDE = 1_000_000


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    con = duckdb.connect()
    import os
    os.makedirs(dst, exist_ok=True)

    def rep(table: str, select: str) -> None:
        parts = " UNION ALL ".join(
            select.format(i=i, src=f"'{src}/{table}.parquet'")
            for i in range(copies))
        con.execute(f"COPY ({parts}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    rep("lineitem", f"""
        SELECT l_orderkey + {{i}} * {STRIDE} AS l_orderkey,
               l_partkey + {{i}} * {STRIDE} AS l_partkey,
               l_suppkey + {{i}} * {STRIDE} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {{src}}""")
    rep("orders", f"""
        SELECT o_orderkey + {{i}} * {STRIDE} AS o_orderkey,
               o_custkey + {{i}} * {STRIDE} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {{src}}""")
    rep("customer", f"""
        SELECT c_custkey + {{i}} * {STRIDE} AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM {{src}}""")
    rep("supplier", f"""
        SELECT s_suppkey + {{i}} * {STRIDE} AS s_suppkey,
               s_name, s_nationkey, s_acctbal
        FROM {{src}}""")
    # copy 0 pristine; copies >0 suffix every token (preserves within-copy
    # shingle structure, zeroes cross-copy overlap)
    rep("documents", f"""
        SELECT doc_id + {{i}} * {STRIDE} AS doc_id,
               CASE WHEN {{i}} = 0 THEN text
                    ELSE array_to_string(
                           list_transform(string_split(text, ' '),
                                          t -> t || 'x{{i}}'), ' ')
               END AS text,
               lang, source,
               CASE WHEN {{i}} = 0 THEN n_chars
                    ELSE length(array_to_string(
                           list_transform(string_split(text, ' '),
                                          t -> t || 'x{{i}}'), ' '))
               END AS n_chars
        FROM {{src}}""")
    # ts jitters forward per copy so event streams interleave instead of
    # stacking 10 identical timelines (DuckDB rewrites ts as MICROS;
    # graft.catalog.Q.t normalizes either physical encoding)
    rep("events", f"""
        SELECT event_id + {{i}} * {STRIDE} AS event_id,
               ts + INTERVAL ({{i}}) SECOND AS ts,
               user_id + {{i}} * {STRIDE} AS user_id,
               event_type, value, props
        FROM {{src}}""")
    rep("embeddings", f"""
        SELECT vec_id + {{i}} * {STRIDE} AS vec_id,
               list_transform(embedding,
                              x -> CAST(x + {{i}} * 0.0001 AS FLOAT)) AS embedding,
               label
        FROM {{src}}""")


if __name__ == "__main__":
    main()
