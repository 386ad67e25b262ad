#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: check_oracle.py <sfdir> <verify_outdir>

For each query result parquet under <verify_outdir>/<name>/, runs the
matching SQL from oracle_sql.json in DuckDB over the testdata tables,
sorts columns by name, hashes the values, and compares row counts,
schemas, and hashes — mirroring CORRECTNESS_r{N}.json semantics.
"""
import sys, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]

with open(f"{outdir}/oracle_sql.json") as f:
    oracles = json.load(f)

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df

def h(df: pd.DataFrame) -> str:
    # stringify with fixed float repr; row order as produced
    rows = []
    for tup in df.itertuples(index=False):
        rows.append("|".join(
            "NULL" if v is None or (isinstance(v, float) and pd.isna(v)) else
            (repr(float(v)) if isinstance(v, float) else str(v))
            for v in tup))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]

results = {}
for name, sql in sorted(oracles.items()):
    path_glob = glob.glob(f"{outdir}/{name}.parquet/*.parquet") or \
        glob.glob(f"{outdir}/{name}/*.parquet")
    if not path_glob:
        results[name] = {"status": "NO_SPARK_RESULT"}
        continue
    spark_df = pq.read_table(path_glob[0]).to_pandas()
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        results[name] = {"status": "ORACLE_SQL_ERROR", "err": str(e)[:200]}
        continue
    s, dck = norm(spark_df), norm(duck_df)
    entry = {"rows_spark": len(s), "rows_duck": len(dck),
             "cols_spark": list(s.columns), "cols_duck": list(dck.columns)}
    if len(s) != len(dck):
        entry["status"] = "ROWCOUNT_MISMATCH"
    elif list(s.columns) != list(dck.columns):
        entry["status"] = "SCHEMA_MISMATCH"
    else:
        # compare value-by-value with float tolerance fallback
        hs, hd = h(s), h(dck)
        if hs == hd:
            entry["status"] = "OK"
        else:
            # locate first differing cell for diagnostics
            diff = None
            for i in range(len(s)):
                for c in s.columns:
                    a, b = s.iloc[i][c], dck.iloc[i][c]
                    if (pd.isna(a) if not isinstance(a,(list,tuple)) else False) and (pd.isna(b) if not isinstance(b,(list,tuple)) else False):
                        continue
                    if str(a) != str(b):
                        diff = (i, c, str(a)[:60], str(b)[:60])
                        break
                if diff: break
            entry["status"] = "HASH_MISMATCH" if diff else "OK_STRFMT"
            if diff:
                entry["first_diff"] = diff
    results[name] = entry

ok = sum(1 for v in results.values() if v.get("status") in ("OK","OK_STRFMT"))
print(f"== {ok}/{len(results)} green ==")
for name, v in sorted(results.items()):
    status = v.get("status")
    mark = "PASS" if status in ("OK","OK_STRFMT") else "FAIL"
    print(f"{mark} {name}: {status}" + (f" {v.get('first_diff')}" if v.get("first_diff") else "") + (f" {v.get('err','')}" if v.get('err') else ""))
    if status in ("ROWCOUNT_MISMATCH","SCHEMA_MISMATCH"):
        print("   ", {k: v[k] for k in ("rows_spark","rows_duck","cols_spark","cols_duck")})
