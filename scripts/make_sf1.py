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
data volume in TPC-H either).

CONTENT scheme (round-11 change — the earlier fixture cloned text and
embeddings VERBATIM, so every duplicate group grew 10x and the
pair-emitting queries' true output grew ~100x/decade, a fixture
artifact, where a real decade grows pairs ~10x):

- documents.text: clone i > 0 applies a per-clone caesar shift to
  letters (translate, length-preserving, so n_chars stays exact and
  token/whitespace structure is untouched). Two docs inside the SAME
  clone keep their original token-overlap structure (both shifted
  alike), so each clone universe retains internal near-dup structure,
  while cross-clone token overlap drops to zero (below every
  shingle/simhash threshold — measured cross-clone hamming pairs are
  ~2.5% of the total, vs ~90% under the verbatim clones this
  replaces). A shift re-rolls every token's HASH, and the corpus's
  fingerprint-collision density is a high-variance function of that
  draw (hamming<=1 pairs range 95k..1.58M across the 25 possible
  shifts, vs 272k for the unshifted corpus), so the nine clone shifts
  are PINNED to the draws whose density is closest to the base
  corpus's — the fixture models a decade of STATIONARY-density data
  (summed within-clone density 9.6x the base draw) instead of
  inheriting hash-draw variance that would swamp the volume signal.
- a deterministic ~2% of (doc, clone) slots keep the text VERBATIM
  (md5(doc_id*16+i) % 50 == 0): real corpora do carry cross-shard
  exact duplicates, and the dedup family needs true positives that
  span clones. Expected extra exact pairs ~0.19/doc — a bounded
  constant per decade, not a quadratic blowup.
- embeddings.embedding: clone i > 0 cyclically rotates the float
  array by (7*i) % dim positions — exactly distribution-preserving
  per clone, within-clone cosines unchanged (both operands rotate),
  cross-clone cosines ~0. The same 2% verbatim flag (on vec_id)
  plants true cross-clone duplicates.

Timestamps and the other fact-table payloads are copied verbatim: the
fixture measures VOLUME growth, not drift.

Usage: python3 scripts/make_sf1.py [srcDir] [outDir] [clones]

`clones` (default 10) is the growth factor; 2..10 supported (nine
pinned clone shifts). The non-default uses are the WIDTH-SCHEDULE
PROBES: `make_sf1.py /tmp/graft_sf1 /tmp/graft_sf2x 2` builds the
2x-sf1 fixture (40k embeddings — the THIRD multi-probe LSH config,
14 planes / 28 probes) and `... /tmp/graft_sf4x 4` the 4x-sf1
fixture (80k embeddings — the FOURTH config, 15 planes / 61 probes:
the first corpus that leaves the flat T=2*ppb regime for the
round-15 growth table), so the adaptive-width code path and its
oracle replay get exercised past every committed gate scale.
Composing the content scheme is sound:
a caesar shift of a shifted clone is another shift, a rotation of a
rotated embedding is another rotation, and the verbatim flag
re-rolls per (key, clone).
"""
import duckdb, os, shutil, sys

src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/graft_sf1'
CLONES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
assert 2 <= CLONES <= 10, f"clones must be in 2..10, got {CLONES}"

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

LOWER = 'abcdefghijklmnopqrstuvwxyz'
UPPER = LOWER.upper()
DIGIT = '0123456789'

def verbatim_flag(key_col, i):
    """Deterministic ~2% of (row, clone) slots keep content verbatim."""
    return (f"CAST('0x' || substr(md5(CAST({key_col} * 16 + {i} AS VARCHAR)),"
            f" 1, 8) AS BIGINT) % 50 = 0")

# Clone i (1..9) uses SHIFTS[i-1]: the nine letter-shifts whose
# within-clone simhash-collision density is nearest the unshifted
# corpus's 271,878 (see module docstring — density across all shifts
# spans 95k..1.58M, pure hash-draw variance).
SHIFTS = [21, 9, 12, 19, 1, 8, 24, 22, 11]

def caesar(col, i):
    """Per-clone rotation of letters and digits (the corpus has no
    digit tokens today; rotating them keeps the zero-cross-overlap
    property if that changes)."""
    s = SHIFTS[i - 1] % 26
    sd = SHIFTS[i - 1] % 10 or 3
    to = (LOWER[s:] + LOWER[:s] + UPPER[s:] + UPPER[:s]
          + DIGIT[sd:] + DIGIT[:sd])
    return f"translate({col}, '{LOWER}{UPPER}{DIGIT}', '{to}')"

# Rotation shifts are modulo the ACTUAL embedding dim (asserted below,
# after the connection opens): with a hardcoded %64 and dim < 64, any
# shift >= dim makes col[s+1:dim] empty and col[1:s] the full list —
# verbatim clones, silently reintroducing the quadratic cross-clone
# duplicate artifact this fixture exists to remove. A shift of 0 has
# the same effect, so dim must not divide 7*i for any clone (checked).
EMB_DIM = None  # set in main flow once the connection is open

def rotate(col, i, dim_expr):
    s = (7 * i) % EMB_DIM
    assert s != 0, f"rotate: shift 0 for clone {i} (dim {EMB_DIM}) would clone verbatim"
    return (f"list_concat({col}[{s + 1}:{dim_expr}], "
            f"{col}[1:{s}])")

# Row-group sizes for the SMALL-but-scan-heavy tables. DuckDB's default
# row group (122,880 rows) puts all 50k documents / 20k embeddings into
# ONE group, and a single-row-group parquet file is unsplittable — every
# Spark scan of it runs as ONE task no matter how
# spark.sql.files.maxPartitionBytes is set. That serialized the whole
# text-scan family at sf1 (round-12 finding: q72's dominant stage had
# task time == wall; re-chunking + 256 KB splits took it 3.9 -> 0.9 s).
# ~2k-row groups give documents ~25 / embeddings ~10 independently
# readable chunks — the single-file stand-in for the many-file layout
# any real corpus has. Fact tables with millions of rows already span
# enough default-size groups to split.
ROW_GROUPS = {'documents': 2048, 'embeddings': 1024}

def clone(table, keyed_cols, plain_cols, content=None):
    """content: optional fn(i) -> list of SQL select items replacing
    the plain columns for clone i (i=0 is always verbatim)."""
    sels = []
    for i in range(CLONES):
        ks = ', '.join(f"{c} + {i} * {OFF[o]} AS {c}" for c, o in keyed_cols)
        ps = ', '.join(plain_cols if (i == 0 or content is None)
                       else content(i))
        sels.append(f"SELECT {ks}, {ps} FROM t")
    rg = f", ROW_GROUP_SIZE {ROW_GROUPS[table]}" if table in ROW_GROUPS else ""
    con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM read_parquet('{src}/{table}.parquet')")
    con.execute(f"COPY ({' UNION ALL '.join(sels)}) TO '{out}/{table}.parquet' (FORMAT PARQUET{rg})")
    n = con.execute(f"select count(*) from read_parquet('{out}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n}")

dims = con.execute(
    f"select distinct len(embedding) from read_parquet('{src}/embeddings.parquet')"
).fetchall()
assert dims == [(64,)], (
    f"embedding dim changed ({dims}): re-check the rotate() shifts (7*i % dim "
    "must be nonzero for i in 1..9) and re-run the shift-density scan that "
    "pinned SHIFTS before trusting this fixture")
EMB_DIM = dims[0][0]

clone('documents', [('doc_id', 'doc')], ['text', 'lang', 'source', 'n_chars'],
      content=lambda i: [
          f"CASE WHEN {verbatim_flag('doc_id', i)} THEN text "
          f"ELSE {caesar('text', i)} END AS text",
          'lang', 'source', 'n_chars'])
clone('embeddings', [('vec_id', 'vec')], ['embedding', 'label'],
      content=lambda i: [
          f"CASE WHEN {verbatim_flag('vec_id', i)} THEN embedding "
          f"ELSE {rotate('embedding', i, 'len(embedding)')} END AS embedding",
          'label'])
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
