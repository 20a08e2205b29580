#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness check.

Usage: compare.py [sfDir] [verifyOutDir]
Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.
"""
import duckdb, json, sys, glob, os, re
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']

con = duckdb.connect()
# Optional resource guards for large-SF runs (results are unaffected):
# an oracle that would exhaust the shared disk fails loudly instead of
# taking down every concurrent job — the sf1 probe lost a bench run and
# two oracle queries to exactly that before q189/q266's oracles were
# made spill-feasible.
def _size_env(name):
    """Validated size literal from the environment (e.g. '40GB',
    '1.5GiB') — the value is interpolated into a SET statement, so
    anything that isn't a plain size literal is rejected loudly."""
    v = os.environ.get(name)
    if not v:
        return None
    if not re.fullmatch(r'[0-9]+(\.[0-9]+)?\s*[KMGT]?i?B', v.strip()):
        sys.exit(f"{name}={v!r} is not a size literal like '40GB'")
    return v.strip()

cap = _size_env('GRAFT_ORACLE_TEMP_CAP')
if cap:
    con.execute(f"SET max_temp_directory_size='{cap}'")
mem = _size_env('GRAFT_ORACLE_MEM')
if mem:
    con.execute(f"SET memory_limit='{mem}'")
for t in TABLES:
    con.execute(f"create view {t} as select * from read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f'{out}/oracle_sql.json'))
fails, passes = [], []
for name in sorted(oracle):
    sql = oracle[name]
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e)[:200]}")
        fails.append(name); continue
    files = glob.glob(f'{out}/{name}/*.parquet')
    if not files:
        print(f"FAIL {name}: no spark output")
        fails.append(name); continue
    sdf = con.execute(f"select * from read_parquet('{out}/{name}/*.parquet')").fetchdf()
    o = odf[sorted(odf.columns)]
    s = sdf[sorted(sdf.columns)]
    if list(o.columns) != list(s.columns):
        print(f"FAIL {name}: cols spark={list(s.columns)} oracle={list(o.columns)}")
        fails.append(name); continue
    # Driver parity: its hash covers typed values, so a dtype diff is a FAIL
    # here too (round 7's only red row was a dtype-only divergence that this
    # gate used to record as a PASS footnote).
    dt_diff = [(c, str(s[c].dtype), str(o[c].dtype)) for c in o.columns
               if str(s[c].dtype) != str(o[c].dtype)]
    if dt_diff:
        print(f"FAIL {name}: dtype diff {dt_diff}")
        fails.append(name); continue
    o = o.sort_values(by=list(o.columns)).reset_index(drop=True)
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    if len(o) != len(s):
        print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
        fails.append(name); continue
    bad = None
    for c in o.columns:
        ov, sv = o[c], s[c]
        if ov.dtype.kind == 'f' or sv.dtype.kind == 'f':
            neq = ~((ov == sv) | (ov.isna() & sv.isna()))
        else:
            neq = ~((ov.astype(object) == sv.astype(object)) | (ov.isna() & sv.isna()))
        if neq.any():
            i = int(np.argmax(neq.values))
            bad = (c, i, sv.iloc[i], ov.iloc[i])
            break
    if bad:
        c, i, svv, ovv = bad
        print(f"FAIL {name}: col {c} row {i}: spark={svv!r} oracle={ovv!r}")
        fails.append(name); continue
    print(f"PASS {name} ({len(o)} rows)")
    passes.append(name)

print(f"\n{len(passes)} pass, {len(fails)} fail")
if fails:
    print("failing:", ", ".join(fails))
    sys.exit(1)
