#!/usr/bin/env python3
"""Synthesize a ~sf1 bench dataset at /tmp/graft_sf1 by replicating sf0.1
with shifted keys (local tooling only — the engine never reads this path
unless SPARK_GRAFT_SF_DIR points at it).

Fact tables scale 10x with disjoint key ranges; dimension tables are copied
as-is so join fan-outs match a real TPC-H-ish scale-up. documents get a
per-copy text suffix so the corpus is boilerplate-heavy (near-dup) rather
than purely duplicated. Row groups are capped at 1M rows so parquet scans
actually split into multiple tasks (the sf0.1 files are single-row-group).
"""
import duckdb, os, sys

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10  # 10 -> ~sf1, 30 -> ~sf3
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def emit(name, sql):
    # Row groups sized so every table's scan splits ~32 ways: a row group
    # is parquet's minimum split unit, and a fixed 1M-row cap left the
    # 50k-row documents / 20k-row embeddings / 1M-row events tables as
    # SINGLE row groups — serializing every tokenize/hash-heavy scan onto
    # one core and misreporting the engine's scale-up. A real 100 TB
    # corpus is thousands of files; >= 32 splits per table is the honest
    # local analog.
    n = con.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
    rg = max(1000, n // 32)
    con.execute(
        f"COPY ({sql}) TO '{DST}/{name}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE {rg})")
    print(f"{name}: {n} rows, row_group_size {rg}", flush=True)

def src(name):
    return f"read_parquet('{SRC}/{name}.parquet')"

# dimensions: unchanged
for t in ["region", "nation", "customer", "supplier", "part"]:
    emit(t, f"SELECT * FROM {src(t)}")

ordmax = con.execute(f"SELECT max(o_orderkey)+1 FROM {src('orders')}").fetchone()[0]
emit("orders", f"""
  SELECT o_orderkey + i*{ordmax} AS o_orderkey, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')}, range({COPIES}) r(i)""")

emit("lineitem", f"""
  SELECT l_orderkey + i*{ordmax} AS l_orderkey, l_partkey, l_suppkey, l_linenumber,
         l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')}, range({COPIES}) r(i)""")

evmax = con.execute(f"SELECT max(event_id)+1 FROM {src('events')}").fetchone()[0]
umax = con.execute(f"SELECT max(user_id)+1 FROM {src('events')}").fetchone()[0]
emit("events", f"""
  SELECT event_id + i*{evmax} AS event_id, ts::TIMESTAMP_NS AS ts, user_id + i*{umax} AS user_id,
         event_type, value, props
  FROM {src('events')}, range({COPIES}) r(i)""")

docmax = con.execute(f"SELECT max(doc_id)+1 FROM {src('documents')}").fetchone()[0]
emit("documents", f"""
  SELECT doc_id + i*{docmax} AS doc_id,
         CASE WHEN i = 0 THEN text ELSE text || ' variant mark ' || i END AS text,
         lang, source, n_chars
  FROM {src('documents')}, range({COPIES}) r(i)""")

vecmax = con.execute(f"SELECT max(vec_id)+1 FROM {src('embeddings')}").fetchone()[0]
emit("embeddings", f"""
  SELECT vec_id + i*{vecmax} AS vec_id,
         CASE WHEN i = 0 THEN embedding
              ELSE [CAST(x + 0.001*i AS FLOAT) for x in embedding] END AS embedding,
         label
  FROM {src('embeddings')}, range({COPIES}) r(i)""")
print("done", flush=True)
