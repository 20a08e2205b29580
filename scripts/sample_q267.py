#!/usr/bin/env python3
"""Sample-scoped q267 oracle for the 8x width probe (round 16).

q267's FULL oracle at the 8x-sf1 fixture exceeds the host: the
full-corpus keys/fl/pr CTE chain (160k vectors x 4 bands x ~696
pruned flips) measured >65 GiB of DuckDB temp before dying (round 16,
GRAFT_ORACLE_TEMP_CAP=70GB on a ~74 GB-free disk). Everything in
q267's output EXCEPT the full-corpus candidate census
(n_cand_rows / cand_rows_per_vec) is derived from the deterministic
~256-vector sample, so this script scopes the compare to exactly
that:

 1. ORACLE: pushes `vec_id % smod = 0` INTO the el CTE (the root of
    every per-vector computation), which shrinks keys/fl/pr to the
    sample — the 16-plane blocking arithmetic (margins, multi-bit
    probe selection, key assembly) is then verified BIT-FOR-BIT on
    625 vectors in seconds. The two full-corpus census columns are
    dropped from the outer SELECT (they would now be sample-scoped
    and wrong); prm0's n stays the full-table count, so the schedule
    constants (ppb/nprobe/smod) are still the production derivation.
 2. ENGINE: drops the same two columns from the (untouched) Spark
    output parquet, in place.

The census itself stays ENGINE-verified at 8x via LshRecallSpec's
pinned ceiling; at 2x/4x the full oracle (census included) remains
the record. Replacements are anchored and FAIL LOUDLY if the SQL
shape changed.

Usage: sample_q267.py VERIFY_OUT_DIR
"""
import glob
import json
import os
import sys

import duckdb

out = sys.argv[1]
name = "q267_lsh_recall"

osql_path = os.path.join(out, "oracle_sql.json")
oracle = json.load(open(osql_path))
sql = oracle[name]

el_anchor = ("AND len(list_filter(embedding, e -> e IS NULL)) = 0)")
if el_anchor not in sql:
    sys.exit(f"sample_q267: el-CTE anchor not found in {name}'s oracle SQL "
             "— the usable-vector predicate moved; update this script")
sql = sql.replace(
    el_anchor,
    el_anchor[:-1] + "\n            AND vec_id % (SELECT smod FROM prm) = 0)",
    1)

census_cols = [
    """CAST(coalesce((SELECT sum((k * (k - 1)) // 2) FROM bkh), 0)
             AS BIGINT) AS n_cand_rows,""",
    """CAST(coalesce((SELECT sum((k * (k - 1)) // 2) FROM bkh), 0)
             // (SELECT n FROM prm) AS BIGINT) AS cand_rows_per_vec,""",
]
for c in census_cols:
    if c not in sql:
        sys.exit(f"sample_q267: census-column anchor not found:\n{c}\n"
                 "— the outer SELECT changed; update this script")
    sql = sql.replace(c, "", 1)
oracle[name] = sql
json.dump(oracle, open(osql_path, "w"))

pdir = os.path.join(out, name)
files = glob.glob(os.path.join(pdir, "*.parquet"))
if not files:
    sys.exit(f"sample_q267: no engine parquet under {pdir}")
con = duckdb.connect()
tmp = os.path.join(pdir, "_sampled.parquet.tmp")
con.execute(
    f"COPY (SELECT * EXCLUDE (n_cand_rows, cand_rows_per_vec) "
    f"FROM read_parquet('{pdir}/*.parquet')) TO '{tmp}' (FORMAT PARQUET)")
for f in files:
    os.remove(f)
os.rename(tmp, os.path.join(pdir, "sample_scoped.parquet"))
print(f"sample_q267: {name} compare scoped to the deterministic sample "
      "(full-corpus census columns dropped from both sides; census stays "
      "engine-pinned by LshRecallSpec)")
