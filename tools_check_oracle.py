import duckdb, json, glob, sys
import pandas as pd

import sys
sf = sys.argv[1] if len(sys.argv)>1 else "/root/testdata/sf0.01"
out_arg = sys.argv[2] if len(sys.argv)>2 else "/tmp/verify_out"
out = out_arg
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    try: con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    except Exception as e: print("view fail", t, e)

oracle = json.load(open(f"{out}/oracle_sql.json"))
def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

results = {}
import os
skip = set(q for q in os.environ.get("SKIP_QUERIES", "").split(",") if q)
for name, sql in sorted(oracle.items()):
    if name in skip:
        results[name] = "SKIPPED (via SKIP_QUERIES)"
        continue
    try:
        spark_df = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{out}/{name}/*.parquet")], ignore_index=True)
        duck_df = con.execute(sql).fetchdf()
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"COLS: spark={list(a.columns)} duck={list(b.columns)}"
            continue
        if len(a) != len(b):
            results[name] = f"ROWS: spark={len(a)} duck={len(b)}"
            continue
        # compare stringified
        eq = True
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                    import numpy as np
                    if not np.allclose(av.fillna(-9e9).astype(float), bv.fillna(-9e9).astype(float), rtol=0, atol=0, equal_nan=True):
                        eq = False; results[name] = f"VAL col {c}"; break
                else:
                    if not (av.astype(str).values == bv.astype(str).values).all():
                        eq = False; results[name] = f"VAL col {c}"; break
            except Exception as e:
                eq = False; results[name] = f"CMPERR col {c}: {e}"; break
        if eq: results[name] = "OK"
    except Exception as e:
        results[name] = f"ERR: {type(e).__name__}: {str(e)[:200]}"
for k, v in results.items():
    print(f"{k:22s} {v}")
print(f"\n{sum(1 for v in results.values() if v=='OK')}/{len(results)} OK")
