#!/usr/bin/env python3
"""Generate the 10x scaling slice used by the BASELINE.md spot-check.

Usage: python3 tools/make_sf1ish.py [src_sf_dir] [dst_dir] [replicas]
Defaults: /root/testdata/sf0.1 -> /root/repo/tmp/sf1ish, 10 replicas
(replicas=100 builds the two-decade slice used by the round-8 100x
spot-check; permutations are SEEDED RANDOM shuffles, not rotations, so
any replica count keeps cross-replica shingle overlap at zero)

Design (see BASELINE.md "sf-scaling spot-check"):
- events x10: disjoint event_id/user_id ranges per replica so group
  cardinality scales with volume; ts kept as int64 NANOS (epoch_ns) so
  graft.Tables.events' nanosAsLong read path still applies.
- documents x10: per-replica LETTER PERMUTATIONS -- token statistics
  (lengths, counts) are identical to the source, but replicas share no
  shingles, so near-dup pair counts scale x10 like a real corpus, not
  x100 like naive duplication (a one-token suffix keeps Jaccard >= 0.8
  and turns every doc into a 10-clique with its replicas).
- embeddings x10 (round 8): per-replica ORTHOGONAL maps (a cyclic
  dimension shift composed with a deterministic sign-flip diagonal).
  Orthogonality preserves norms and all within-replica inner products
  -- each replica's neighbor structure is EXACTLY the source's -- while
  cross-replica cosines scatter like random vectors, so ANN candidate
  sets and true-neighbor counts scale x10, not x100.
- TPC-H facts+dims x10 (round 8): customer/supplier/part/orders/
  lineitem replicated under disjoint key offsets with FK references
  rewritten consistently (replica lineitems reference replica parts/
  suppliers/orders), so every join's output scales linearly and the
  broadcast ceilings of the dimension sides really get crossed.
  nation/region stay fixed (25/5 rows, genuinely constant dimensions).
"""
import shutil
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/tmp/sf1ish"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

import os
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

con.execute(f"""
COPY (
  SELECT event_id + r.i * 1000000000 AS event_id, epoch_ns(ts) AS ts,
         user_id + r.i * 10000000 AS user_id, event_type, value, props
  FROM read_parquet('{src}/events.parquet'), (SELECT unnest(range(0,{REPS})) AS i) r
) TO '{dst}/events.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 65536)""")

alphabet = "abcdefghijklmnopqrstuvwxyz"
import random as _rnd
_r = _rnd.Random(4242)
def _perm(i):
    if i == 0:
        return alphabet  # identity replica
    l = list(alphabet)
    _r.shuffle(l)
    return "".join(l)
perms = [_perm(i) for i in range(REPS)]  # seeded, distinct at any REPS
cases = " ".join(
    f"WHEN r.i = {i} THEN translate(text, '{alphabet}', '{p}')"
    for i, p in enumerate(perms))
con.execute(f"""
COPY (
  SELECT doc_id + r.i * 100000000 AS doc_id,
         CASE {cases} END AS text,
         lang, source, n_chars
  FROM read_parquet('{src}/documents.parquet'), (SELECT unnest(range(0,{REPS})) AS i) r
) TO '{dst}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 8192)""")

# embeddings x10: replica i applies the orthogonal map
#   y[j] = sign(i, j) * x[(j + 7*i) mod 64]
# (cyclic shift = permutation matrix, sign pattern = diagonal +-1 --
# their product is orthogonal; i=0 is the identity).
DIM = 64
def emb_expr(i: int) -> str:
    terms = []
    for j in range(DIM):
        srcidx = (j + 7 * i) % DIM + 1  # DuckDB lists are 1-based
        sign = "-" if i > 0 and (j * i + i) % 3 == 0 else ""
        terms.append(f"CAST({sign}embedding[{srcidx}] AS FLOAT)")
    return "[" + ", ".join(terms) + "]"

emb_cases = " ".join(
    f"WHEN r.i = {i} THEN {emb_expr(i)}" for i in range(REPS))
con.execute(f"""
COPY (
  SELECT vec_id + r.i * 10000000 AS vec_id,
         CASE {emb_cases} END AS embedding,
         label
  FROM read_parquet('{src}/embeddings.parquet'), (SELECT unnest(range(0,{REPS})) AS i) r
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 8192)""")

# TPC-H x10 under disjoint key offsets; FKs rewritten consistently.
C_OFF, S_OFF, P_OFF, O_OFF = 10_000_000, 1_000_000, 10_000_000, 100_000_000
rep = f"(SELECT unnest(range(0,{REPS})) AS i) r"
scaled = {
    "customer": f"SELECT c_custkey + r.i * {C_OFF} AS c_custkey, c_name, "
                f"c_nationkey, c_acctbal, c_mktsegment "
                f"FROM read_parquet('{src}/customer.parquet'), {rep}",
    "supplier": f"SELECT s_suppkey + r.i * {S_OFF} AS s_suppkey, s_name, "
                f"s_nationkey, s_acctbal "
                f"FROM read_parquet('{src}/supplier.parquet'), {rep}",
    "part":     f"SELECT p_partkey + r.i * {P_OFF} AS p_partkey, p_name, "
                f"p_brand, p_type, p_size, p_retailprice "
                f"FROM read_parquet('{src}/part.parquet'), {rep}",
    "orders":   f"SELECT o_orderkey + r.i * {O_OFF} AS o_orderkey, "
                f"o_custkey + r.i * {C_OFF} AS o_custkey, o_orderstatus, "
                f"o_totalprice, o_orderdate, o_orderpriority "
                f"FROM read_parquet('{src}/orders.parquet'), {rep}",
    "lineitem": f"SELECT l_orderkey + r.i * {O_OFF} AS l_orderkey, "
                f"l_partkey + r.i * {P_OFF} AS l_partkey, "
                f"l_suppkey + r.i * {S_OFF} AS l_suppkey, l_linenumber, "
                f"l_quantity, l_extendedprice, l_discount, l_tax, "
                f"l_returnflag, l_linestatus, l_shipdate "
                f"FROM read_parquet('{src}/lineitem.parquet'), {rep}",
}
for t, q in scaled.items():
    con.execute(f"COPY ({q}) TO '{dst}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 65536)")

for t in ["region", "nation"]:
    shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

ev = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/events.parquet')").fetchone()[0]
dc = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/documents.parquet')").fetchone()[0]
print(f"wrote {dst}: events={ev} documents={dc}")
