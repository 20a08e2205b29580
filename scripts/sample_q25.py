#!/usr/bin/env python3
"""Deterministic id-sampled slice for q25's 4x-probe oracle (round-15
verdict item 3).

q25's FULL oracle at the 4x-sf1 fixture needs >93 GB RAM + >61 GB
DuckDB temp (the 2.17G-row cand CTE — measured round 15, two plan
shapes), so the fused verify path's arithmetic was oracle-confirmed
only at 2x. This script turns the 4x leg into an exact compare on the
a_id % K = 0 slice:

 1. ORACLE: pushes `x.vec_id % K = 0` INTO the cand CTE (a_id is the
    lesser vec_id, fixed at candidate-generation time, so the
    predicate commutes with the downstream cosine/tau filter and the
    DISTINCT — the sliced oracle is byte-equal to slicing the full
    output). The pushdown matters because cand is MATERIALIZED
    (deliberately — see verify SKILL.md on DuckDB CTE inlining), which
    blocks DuckDB's own filter pushdown; an outer WHERE would still
    materialize all 2.17G rows.
 2. ENGINE: post-filters the (untouched, full) Spark output parquet to
    the same a_id % K = 0 slice, in place.

The replace targets q25's exact candidate-join predicate and FAILS
LOUDLY if the SQL shape changed — a silent no-op sample would
masquerade as a passing compare.

Usage: sample_q25.py VERIFY_OUT_DIR [K=8]
"""
import glob
import json
import os
import sys

import duckdb

out = sys.argv[1]
k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
name = "q25_neardup_cosine"

osql_path = os.path.join(out, "oracle_sql.json")
oracle = json.load(open(osql_path))
sql = oracle[name]
anchor = "AND x.vec_id < y.vec_id"
if anchor not in sql:
    sys.exit(f"sample_q25: anchor {anchor!r} not found in {name}'s oracle "
             "SQL — the cand CTE shape changed; update this script's "
             "pushdown to match")
oracle[name] = sql.replace(
    anchor, f"{anchor} AND x.vec_id % {k} = 0", 1)
json.dump(oracle, open(osql_path, "w"))

pdir = os.path.join(out, name)
files = glob.glob(os.path.join(pdir, "*.parquet"))
if not files:
    sys.exit(f"sample_q25: no engine parquet under {pdir}")
con = duckdb.connect()
tmp = os.path.join(pdir, f"_sampled_mod{k}.parquet.tmp")
con.execute(
    f"COPY (SELECT * FROM read_parquet('{pdir}/*.parquet') "
    f"WHERE a_id % {k} = 0) TO '{tmp}' (FORMAT PARQUET)")
for f in files:
    os.remove(f)
os.rename(tmp, os.path.join(pdir, f"sampled_mod{k}.parquet"))
n = con.execute(
    f"SELECT count(*) FROM read_parquet('{pdir}/*.parquet')").fetchone()[0]
print(f"sample_q25: {name} engine output sliced to a_id % {k} = 0 "
      f"({n} rows kept); oracle cand CTE carries the same pushdown")
