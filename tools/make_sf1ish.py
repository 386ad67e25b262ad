#!/usr/bin/env python3
"""Generate the 10x scaling slice used by the BASELINE.md spot-check.

Usage: python3 tools/make_sf1ish.py [src_sf_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 -> /root/repo/tmp/sf1ish

Design (see BASELINE.md "sf-scaling spot-check"):
- events x10: disjoint event_id/user_id ranges per replica so group
  cardinality scales with volume; ts kept as int64 NANOS (epoch_ns) so
  graft.Tables.events' nanosAsLong read path still applies.
- documents x10: per-replica LETTER PERMUTATIONS -- token statistics
  (lengths, counts) are identical to the source, but replicas share no
  shingles, so near-dup pair counts scale x10 like a real corpus, not
  x100 like naive duplication (a one-token suffix keeps Jaccard >= 0.8
  and turns every doc into a 10-clique with its replicas).
- all other tables ride along unscaled so graft.Bench can resolve them.
"""
import shutil
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/tmp/sf1ish"

import os
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

con.execute(f"""
COPY (
  SELECT event_id + r.i * 1000000000 AS event_id, epoch_ns(ts) AS ts,
         user_id + r.i * 10000000 AS user_id, event_type, value, props
  FROM read_parquet('{src}/events.parquet'), (SELECT unnest(range(0,10)) AS i) r
) TO '{dst}/events.parquet' (FORMAT PARQUET)""")

alphabet = "abcdefghijklmnopqrstuvwxyz"
perms = [alphabet[i:] + alphabet[:i] for i in range(10)]  # i=0 identity
cases = " ".join(
    f"WHEN r.i = {i} THEN translate(text, '{alphabet}', '{p}')"
    for i, p in enumerate(perms))
con.execute(f"""
COPY (
  SELECT doc_id + r.i * 100000000 AS doc_id,
         CASE {cases} END AS text,
         lang, source, n_chars
  FROM read_parquet('{src}/documents.parquet'), (SELECT unnest(range(0,10)) AS i) r
) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")

for t in ["embeddings", "region", "nation", "customer", "supplier",
          "part", "orders", "lineitem"]:
    shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

ev = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/events.parquet')").fetchone()[0]
dc = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/documents.parquet')").fetchone()[0]
print(f"wrote {dst}: events={ev} documents={dc}")
