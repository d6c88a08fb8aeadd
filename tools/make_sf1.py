#!/usr/bin/env python3
"""Synthetic sf1 gate data (VERDICT r12 item 2): replicate sf0.1 REPS
(default 10) times with deterministic key remapping so the once-per-
round oracle gate can run a decade above the driver's largest testdata
— each past scale jump caught real bugs (q205 long overflow, q104
sqrt abort, q198 ulp flip) that the smaller scale could not.

Remapping rules:
  - every BIGINT entity/foreign key gets `+ rep * 10_000_000` (one
    uniform offset keeps orders<->lineitem<->customer and
    part/supplier references consistent across replicas);
  - region/nation (tiny shared dims referenced by *_nationkey) are
    copied once, unremapped;
  - documents keep their text verbatim -> every doc becomes a
    10-member EXACT-dup family, a deliberate dedup-family stress;
  - embeddings jitter dimension 1 by rep*0.001 so no two replicas are
    cosine-identical (ANN top-k stays tie-free / deterministic);
  - values, timestamps, and all other payload columns are unchanged
    (both engines read the same parquet, so payload identity is what
    makes the gate a pure scale probe).

Usage: python3 tools/make_sf1.py [src=/root/testdata/sf0.1] \
                                 [dst=/tmp/testdata/sf1] [reps=10]
"""
import duckdb
import os
import sys

SRC = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
DST = sys.argv[2] if len(sys.argv) > 2 else '/tmp/testdata/sf1'
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 10_000_000

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW r AS SELECT unnest(range({REPS})) AS rep")


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def emit(table, sql):
    con.execute(f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(
        f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')"
    ).fetchone()[0]
    print(f"{table}: {n} rows")


for t in ('region', 'nation'):
    emit(t, f"SELECT * FROM {src(t)}")

emit('customer', f"""
    SELECT c_custkey + rep*{OFF} AS c_custkey, c_name, c_nationkey,
           c_acctbal, c_mktsegment
    FROM {src('customer')}, r""")

emit('supplier', f"""
    SELECT s_suppkey + rep*{OFF} AS s_suppkey, s_name, s_nationkey,
           s_acctbal
    FROM {src('supplier')}, r""")

emit('part', f"""
    SELECT p_partkey + rep*{OFF} AS p_partkey, p_name, p_brand, p_type,
           p_size, p_retailprice
    FROM {src('part')}, r""")

emit('orders', f"""
    SELECT o_orderkey + rep*{OFF} AS o_orderkey,
           o_custkey + rep*{OFF} AS o_custkey,
           o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
    FROM {src('orders')}, r""")

emit('lineitem', f"""
    SELECT l_orderkey + rep*{OFF} AS l_orderkey,
           l_partkey + rep*{OFF} AS l_partkey,
           l_suppkey + rep*{OFF} AS l_suppkey,
           l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
           l_returnflag, l_linestatus, l_shipdate
    FROM {src('lineitem')}, r""")

emit('events', f"""
    SELECT event_id + rep*{OFF} AS event_id, ts,
           user_id + rep*{OFF} AS user_id, event_type, value, props
    FROM {src('events')}, r""")

emit('documents', f"""
    SELECT doc_id + rep*{OFF} AS doc_id, text, lang, source, n_chars
    FROM {src('documents')}, r""")

emit('embeddings', f"""
    SELECT vec_id + rep*{OFF} AS vec_id,
           CAST(list_concat(
                  [CAST(embedding[1] + rep * 0.001 AS FLOAT)],
                  embedding[2:]) AS FLOAT[]) AS embedding,
           label
    FROM {src('embeddings')}, r""")

print(f"wrote {DST} (reps={REPS}, key offset {OFF})")
