#!/usr/bin/env python3
"""Build the /tmp/graft_sf1 fixture: 10x the sf0.1 tables with re-keyed
ids so EVERY fact table (not just documents, as in the round-8 probe)
grows one decade, and each clone is a self-contained join universe —
joins match within a clone, so join output scales 10x, which is the
growth model a real decade of data gives.

Key scheme: clone i in 0..9 offsets every primary/foreign key by
i * (max_key + 1) of its table, consistently on both sides of each FK
(lineitem.l_orderkey <-> orders.o_orderkey, orders.o_custkey <->
customer.c_custkey, lineitem.l_partkey/l_suppkey <-> part/supplier,
events.user_id re-keyed to scale the user universe too). Dimension
tables nation/region stay fixed (25/5 rows — they do not scale with
data volume in TPC-H either). Timestamps and payloads are copied
verbatim: the fixture measures VOLUME growth, not drift.

Usage: python3 scripts/make_sf1.py [srcDir] [outDir]
"""
import duckdb, os, shutil, sys

src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/graft_sf1'

os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads TO 16")

def mx(table, col):
    return con.execute(
        f"select max({col}) + 1 from read_parquet('{src}/{table}.parquet')"
    ).fetchone()[0]

OFF = {
    'doc': mx('documents', 'doc_id'),
    'vec': mx('embeddings', 'vec_id'),
    'evt': mx('events', 'event_id'),
    'usr': mx('events', 'user_id'),
    'ord': mx('orders', 'o_orderkey'),
    'cst': mx('customer', 'c_custkey'),
    'sup': mx('supplier', 's_suppkey'),
    'prt': mx('part', 'p_partkey'),
}

def clone(table, keyed_cols, plain_cols):
    sels = []
    for i in range(10):
        ks = ', '.join(f"{c} + {i} * {OFF[o]} AS {c}" for c, o in keyed_cols)
        ps = ', '.join(plain_cols)
        sels.append(f"SELECT {ks}, {ps} FROM t")
    con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM read_parquet('{src}/{table}.parquet')")
    con.execute(f"COPY ({' UNION ALL '.join(sels)}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"select count(*) from read_parquet('{out}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n}")

clone('documents', [('doc_id', 'doc')], ['text', 'lang', 'source', 'n_chars'])
clone('embeddings', [('vec_id', 'vec')], ['embedding', 'label'])
clone('events', [('event_id', 'evt'), ('user_id', 'usr')],
      ['ts', 'event_type', 'value', 'props'])
clone('orders', [('o_orderkey', 'ord'), ('o_custkey', 'cst')],
      ['o_orderstatus', 'o_totalprice', 'o_orderdate', 'o_orderpriority'])
clone('lineitem', [('l_orderkey', 'ord'), ('l_partkey', 'prt'), ('l_suppkey', 'sup')],
      ['l_linenumber', 'l_quantity', 'l_extendedprice', 'l_discount',
       'l_tax', 'l_returnflag', 'l_linestatus', 'l_shipdate'])
clone('customer', [('c_custkey', 'cst')],
      ['c_name', 'c_nationkey', 'c_acctbal', 'c_mktsegment'])
clone('supplier', [('s_suppkey', 'sup')], ['s_name', 's_nationkey', 's_acctbal'])
clone('part', [('p_partkey', 'prt')],
      ['p_name', 'p_brand', 'p_type', 'p_size', 'p_retailprice'])

for t in ['nation', 'region']:
    shutil.copyfile(f'{src}/{t}.parquet', f'{out}/{t}.parquet')
    print(f"{t}: copied")
