#!/usr/bin/env python3
"""Bounded 10x-drill oracle checker (VERDICT r04 #6).

The 10x drill corpus (data/sf_scaled10) is 10 mutually-unrelated replicas of
sf0.1 (token suffix _r<k>; replica k owns doc_id in [k*1e6, k*1e6+4999]).
Three oracle mirrors (d_ngram_jaccard, d_cc_components, d_drop_near_cc) are
quadratic in the oracle ENGINE (inverted-index self-join / recursive-CTE
closure) and blew past 72 GB when run over all 50k docs at once. Replicas
share no near-dup relations by construction, so the exact answer decomposes:

  1. assert the Spark output has ZERO cross-replica rows (pairs with
     a//1e6 != b//1e6, or component labels crossing a replica boundary);
  2. run the UNCHANGED oracle SQL per replica, with the `documents` view
     filtered to that replica's doc_id range, and compare against the
     Spark output filtered the same way.

Each per-replica oracle is an sf0.1-sized problem (5,000 docs) - the scale
already proven tractable by the direct sf0.1 drill - so the checker's peak
memory is bounded by ONE replica regardless of drill scale. Every other
query runs through the plain full-corpus comparison.

Usage: check_scaled_bounded.py <sf_dir> <verify_out_dir>
"""
import duckdb, json, glob, sys, time, os
import numpy as np
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf_scaled10"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_scaled"
REPLICA = 1_000_000  # doc_id stride per replica
NREP = 10
QUADRATIC = {"d_ngram_jaccard", "d_cc_components", "d_drop_near_cc"}
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

oracle = json.load(open(f"{out}/oracle_sql.json"))
# SKIP_QUERIES: comma-separated full-corpus queries to skip (e.g. the
# contamination pair, whose oracle mirrors materialize ~2.5 GB of 13-gram
# strings at 50k docs and dominate checker wall time; skip them ONLY when
# their implementation + SQL are unchanged since a recorded green drill)
SKIP = set(q for q in os.environ.get("SKIP_QUERIES", "").split(",") if q)

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def compare(a, b):
    a, b = canon(a), canon(b)
    if list(a.columns) != list(b.columns):
        return f"COLS: spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS: spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            if not np.allclose(av.fillna(-9e9).astype(float),
                               bv.fillna(-9e9).astype(float),
                               rtol=0, atol=0, equal_nan=True):
                return f"VAL col {c}"
        elif not (av.astype(str).values == bv.astype(str).values).all():
            return f"VAL col {c}"
    return "OK"

def spark_out(name):
    return pd.concat([pd.read_parquet(p) for p in glob.glob(f"{out}/{name}/*.parquet")],
                     ignore_index=True)

results = {}
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

for name, sql in sorted(oracle.items()):
    if name in QUADRATIC:
        continue
    if name in SKIP:
        results[name] = "SKIPPED (unchanged since last green drill)"
        print(f"{name:22s} {results[name]}", flush=True)
        continue
    t0 = time.time()
    try:
        results[name] = compare(spark_out(name), con.execute(sql).fetchdf())
    except Exception as e:
        results[name] = f"ERR: {type(e).__name__}: {str(e)[:200]}"
    print(f"{name:22s} {results[name]}  {time.time()-t0:.1f}s", flush=True)
con.close()

for name in sorted(QUADRATIC):
    t0 = time.time()
    sdf = spark_out(name)
    # 1. zero cross-replica relations in the Spark output
    if {"a", "b"} <= set(sdf.columns):
        cross = (sdf["a"] // REPLICA != sdf["b"] // REPLICA).sum()
    elif {"doc_id", "component"} <= set(sdf.columns):
        cross = (sdf["doc_id"] // REPLICA != sdf["component"] // REPLICA).sum()
    else:
        cross = 0  # survivor table: rows are single docs, nothing to cross
    if cross:
        results[name] = f"CROSS-REPLICA rows: {cross}"
        print(f"{name:22s} {results[name]}", flush=True)
        continue
    # 2. per-replica bounded oracle, fresh connection each time so the
    #    checker's footprint is one replica's working set
    verdict = "OK"
    for k in range(NREP):
        lo, hi = k * REPLICA, k * REPLICA + REPLICA - 1
        c = duckdb.connect()
        for t in TABLES:
            if t == "documents":
                c.execute(f"CREATE VIEW documents AS SELECT * FROM "
                          f"read_parquet('{sf}/documents.parquet') "
                          f"WHERE doc_id BETWEEN {lo} AND {hi}")
            else:
                c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
        duck = c.execute(oracle[name]).fetchdf()
        c.close()
        idcol = "a" if "a" in sdf.columns else "doc_id"
        sub = sdf[(sdf[idcol] >= lo) & (sdf[idcol] <= hi)]
        r = compare(sub.reset_index(drop=True), duck)
        if r != "OK":
            verdict = f"replica {k}: {r}"
            break
        print(f"  {name} replica {k}: OK ({len(duck)} rows)", flush=True)
    results[name] = verdict
    print(f"{name:22s} {results[name]}  {time.time()-t0:.1f}s", flush=True)

print()
for k, v in sorted(results.items()):
    print(f"{k:22s} {v}")
ok = sum(1 for v in results.values() if v == "OK" or v.startswith("SKIPPED"))
print(f"\n{ok}/{len(results)} OK")
sys.exit(0 if ok == len(results) else 1)
