#!/usr/bin/env python3
"""Join a 100x-slice bench run against the committed sf0.1 min-of-3
(BENCH_LATEST.json) and emit the per-query scaling-exponent table for
BASELINE.md.

Usage: sweep_exponents.py <sweep_json_or_log> [base_json]

exponent = log(wall_100x / wall_sf01) / log(100) — the alpha in
wall ~ data^alpha. <= 1.0 means at-most-linear scaling. The sf0.1 side
is a warm min-of-3 while the sweep side is a cold single rep, so small
positive exponents on sub-second queries mostly price JVM/codegen
warmup, not the operator; the table is read for the BIG rows and for
anything > 1.0.
"""
import json, math, sys, re

sweep_path = sys.argv[1]
base_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_LATEST.json"

def load_bench_line(path):
    txt = open(path, errors="replace").read()
    # take the last JSON object line with "metric":"total"
    cands = [l for l in txt.splitlines() if '"metric":"total"' in l]
    if not cands:
        raise SystemExit(f"no bench contract line in {path}")
    line = cands[-1]
    start = line.index("{")
    return json.loads(line[start:])

sweep = load_bench_line(sweep_path)
base = load_bench_line(base_path)

sq, bq = sweep["queries"], base["queries"]
ssh = sweep.get("shuffle_mb", {})
bsh = base.get("shuffle_mb", {})
rows = []
for name in sorted(sq):
    w100 = sq[name]
    if name.startswith("store_"):
        continue
    if name not in bq:
        rows.append((name, None, w100, None, ssh.get(name), bsh.get(name)))
        continue
    w01 = bq[name]
    if w01 <= 0 or w100 <= 0:
        exp = None
    else:
        exp = math.log(w100 / w01) / math.log(100)
    rows.append((name, w01, w100, exp, ssh.get(name), bsh.get(name)))

print(f"| query | sf0.1 s (min-of-3, warm) | 100x s (cold, 1 rep) | exponent | shuffle sf0.1 MB | shuffle 100x MB |")
print("|---|---|---|---|---|---|")
over = []
for name, w01, w100, exp, s100, s01 in rows:
    e = f"{exp:.2f}" if exp is not None else "—"
    if exp is not None and exp > 1.0:
        over.append((name, exp))
        e = f"**{exp:.2f}**"
    w01s = f"{w01:.2f}" if w01 is not None else "—"
    s01s = f"{s01:.1f}" if s01 is not None else "—"
    s100s = f"{s100:.1f}" if s100 is not None else "—"
    print(f"| {name} | {w01s} | {w100:.2f} | {e} | {s01s} | {s100s} |")

errs = sweep.get("errors", {})
if errs:
    print("\nERRORS:")
    for k, v in errs.items():
        print(f"  {k}: {v[:160]}")
total_measured = sum(v for v in sq.values() if v > 0)
print(f"\nmeasured: {sum(1 for _ in rows)} queries, total {total_measured:.0f} s"
      f"; exponents > 1.0: {len(over)} -> {[(n, round(e,2)) for n, e in over]}")
