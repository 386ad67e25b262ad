#!/usr/bin/env python3
"""Generate the coarse-quantizer SATURATION slice for the ANN sub-cell
scale demonstration (AnnSubCellProfile / BASELINE.md round-14 row).

Usage: python3 tools/make_bigemb.py [dst_dir] [n]
Defaults: /root/repo/tmp/bigemb, n = 2^25 = 33,554,432

Why 2^25: the IVF coarse quantizer clamps at 4096 cells, so membership
crosses the sub-split activation (subProbes * target = 8 * 512 = 4096)
exactly at n = 2^24. A 2^25 corpus puts membership at 8192 — one
doubling past activation, where annIvfSubBitsFor returns b = 4 and the
per-probed-bucket membership lands at 512 EXACTLY, so the profile can
show per-query candidates at 2^25 (split) ~= per-query candidates at
2^24 (unsplit boundary) — the frozen-budget / linear-total-pairs claim,
measured rather than derived.

Vectors are seeded standard-normal float32, 64-dim — the same
"uncorrelated random directions" profile as the driver testdata's
embeddings (ANN's adversarial case: no cluster structure to exploit).
vec_id is the row index, so any n' <= n prefix (vec_id < n') is itself
a valid seeded corpus — one file serves every scale point.
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

dst = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tmp/bigemb"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 25
DIMS = 64
CHUNK = 1 << 20

import os
os.makedirs(dst, exist_ok=True)
out = f"{dst}/embeddings.parquet"

rng = np.random.Generator(np.random.PCG64(20260815))
# plain (non-fixed) LIST to match the driver testdata's physical type
schema = pa.schema([
    ("vec_id", pa.int64()),
    ("embedding", pa.list_(pa.float32())),
])
writer = pq.ParquetWriter(out, schema, compression="snappy")
done = 0
while done < N:
    m = min(CHUNK, N - done)
    vecs = rng.standard_normal((m, DIMS)).astype(np.float32)
    ids = np.arange(done, done + m, dtype=np.int64)
    offsets = np.arange(0, (m + 1) * DIMS, DIMS, dtype=np.int32)
    emb = pa.ListArray.from_arrays(pa.array(offsets), pa.array(vecs.reshape(-1)))
    batch = pa.record_batch([pa.array(ids), emb], schema=schema)
    writer.write_batch(batch)
    done += m
    if done % (4 * CHUNK) == 0:
        print(f"{done}/{N}", flush=True)
writer.close()
print(f"wrote {out}: {N} x {DIMS} float32")
