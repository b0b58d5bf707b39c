#!/usr/bin/env python3
"""Reconstruct /root/testdata/sf0.001 as a deterministic, referentially
consistent 1/10 subset of sf0.01.

Why this exists: a round-9 session invoked graft.Verify with its two
arguments reversed, so Verify treated the sf0.001 fixture directory as
its OUTPUT directory and (by its own start-from-empty contract) deleted
the original driver-generated tables.  The per-SF fixtures are generated
independently (sf0.01 is not a row-prefix of sf0.1 — verified by EXCEPT
before writing this), so a bit-exact restoration is impossible offline.
This script restores a structurally faithful stand-in:

  - identical arrow schemas (types, timestamp units) per table,
  - dense key spaces 0..N-1 at 1/10 the sf0.01 sizes (matching the
    observed cross-SF scaling; embeddings scale 4x per 10x SF),
  - complete per-entity histories: customers keep ALL their orders,
    orders keep ALL their lineitems, users keep ALL their events —
    so sessions/funnels/retention and order-grain invariants survive,
  - deterministic (pure key-range subsets + rank/mod remaps; no RNG).

Distributional caveat (documented in STATUS.md): value columns are
subsets of sf0.01 draws, not fresh seed-42 draws, so aggregate values
differ from the destroyed original.  Nothing in the repo pins sf0.001
VALUES — the driver's smoke check is rows>0 and every correctness
compare (driver and tools/check.py) runs engine-vs-oracle on the same
files.
"""
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01"
DST = "/root/testdata/sf0.001"

con = duckdb.connect()


def write(table_name, arrow_tbl):
    # cast to the exact source schema so types/units match the driver's
    src_schema = pq.read_schema(f"{SRC}/{table_name}.parquet")
    out = arrow_tbl.select(src_schema.names).cast(src_schema)
    pq.write_table(out, f"{DST}/{table_name}.parquet")
    print(f"{table_name}: {out.num_rows} rows")


def q(sql):
    return con.sql(sql.replace("{S}", SRC)).arrow()


# dims: verbatim copies (fixed-size at every SF)
write("region", q("SELECT * FROM read_parquet('{S}/region.parquet') ORDER BY r_regionkey"))
write("nation", q("SELECT * FROM read_parquet('{S}/nation.parquet') ORDER BY n_nationkey"))

# entity tables: dense key-range prefixes at 1/10 size
write("customer", q("SELECT * FROM read_parquet('{S}/customer.parquet') WHERE c_custkey < 150 ORDER BY c_custkey"))
write("supplier", q("SELECT * FROM read_parquet('{S}/supplier.parquet') WHERE s_suppkey < 10 ORDER BY s_suppkey"))
write("part", q("SELECT * FROM read_parquet('{S}/part.parquet') WHERE p_partkey < 200 ORDER BY p_partkey"))

# orders of kept customers, orderkeys remapped dense by rank so the key
# space is 0..N-1 like every driver-generated SF
write("orders", q("""
  SELECT rank() OVER (ORDER BY o_orderkey) - 1 AS o_orderkey,
         o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{S}/orders.parquet') WHERE o_custkey < 150
  ORDER BY 1"""))

# all lineitems of kept orders; part/supp FKs folded into the kept dim
# ranges by mod (uniform keys, so the join fan-out distribution holds)
write("lineitem", q("""
  WITH keep AS (
    SELECT o_orderkey AS old_key,
           rank() OVER (ORDER BY o_orderkey) - 1 AS new_key
    FROM read_parquet('{S}/orders.parquet') WHERE o_custkey < 150)
  SELECT k.new_key AS l_orderkey, l_partkey % 200 AS l_partkey,
         l_suppkey % 10 AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate
  FROM read_parquet('{S}/lineitem.parquet') l JOIN keep k ON l.l_orderkey = k.old_key
  ORDER BY 1, l_linenumber"""))

# complete event histories of the first 15 users (events users scale as
# customers/10 at every SF), event ids remapped dense
write("events", q("""
  SELECT rank() OVER (ORDER BY event_id) - 1 AS event_id,
         ts, user_id, event_type, value, props
  FROM read_parquet('{S}/events.parquet') WHERE user_id < 15
  ORDER BY 1"""))

# documents/embeddings FLOOR at the sf0.01 size rather than shrinking
# further: MultimodalSpec/SamplingSpec pin 500 documents at sf0.001, so
# the original generator kept the full 500-doc corpus at both small SFs
# (and the symmetric choice is made for embeddings) — verbatim copies.
write("documents", q("SELECT * FROM read_parquet('{S}/documents.parquet') ORDER BY doc_id"))
write("embeddings", q("SELECT * FROM read_parquet('{S}/embeddings.parquet') ORDER BY vec_id"))

print("done")
