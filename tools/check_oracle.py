import duckdb, json, glob, sys, os
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
# optional 3rd arg: explicit data dir (e.g. the tools/make_sf10x.py output)
datadir = sys.argv[3] if len(sys.argv) > 3 else f"/root/testdata/sf{sf}"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    # partial derived dirs (e.g. the 100x spot-proof subset) miss some
    # tables; queries that touch one then fail per-query as ORACLE SQL ERROR
    if os.path.exists(f"{datadir}/{t}.parquet"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{datadir}/{t}.parquet'")
oracle = json.load(open(f"{out}/oracle_sql.json"))
for name, sql in sorted(oracle.items()):
    try:
        got = pd.read_parquet(f"{out}/{name}")
    except Exception as e:
        print(f"{name}: NO SPARK OUTPUT {e}"); continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR {e}"); continue
    g = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
    e = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).reset_index(drop=True)
    if sorted(got.columns) != sorted(exp.columns):
        print(f"{name}: SCHEMA MISMATCH spark={sorted(got.columns)} duck={sorted(exp.columns)}"); continue
    if len(g) != len(e):
        print(f"{name}: ROWCOUNT {len(g)} vs {len(e)}"); continue
    ok = True
    for c in g.columns:
        a, b = g[c], e[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                import numpy as np
                if not np.array_equal(a.to_numpy(dtype="float64"), b.to_numpy(dtype="float64"), equal_nan=True):
                    diff = (a.astype(float) - b.astype(float)).abs().max()
                    print(f"{name}: COL {c} maxdiff={diff}"); ok = False
            else:
                if not a.astype(str).equals(b.astype(str)):
                    print(f"{name}: COL {c} value mismatch"); ok = False
        except Exception as ex:
            print(f"{name}: COL {c} compare error {ex}"); ok = False
    if ok: print(f"{name}: OK rows={len(g)}")
