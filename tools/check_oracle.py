import duckdb, json, glob, sys, os
import pandas as pd

# optional --json PATH: also emit a machine-readable result map (used by
# the SCALE10X_r{N} scale-proof artifacts)
json_out = None
argv = sys.argv[1:]
if "--json" in argv:
    i = argv.index("--json")
    if i + 1 >= len(argv):
        sys.exit("usage: check_oracle.py [sf] [out_dir] [datadir] [--json PATH]")
    json_out = argv[i + 1]
    argv = argv[:i] + argv[i + 2:]

sf = argv[0] if len(argv) > 0 else "0.01"
out = argv[1] if len(argv) > 1 else "/tmp/verify_out"
# optional 3rd arg: explicit data dir (e.g. the tools/make_sf10x.py output)
datadir = argv[2] if len(argv) > 2 else f"/root/testdata/sf{sf}"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    # partial derived dirs (e.g. the 100x spot-proof subset) miss some
    # tables; queries that touch one then fail per-query as ORACLE SQL ERROR
    if os.path.exists(f"{datadir}/{t}.parquet"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{datadir}/{t}.parquet'")
oracle = json.load(open(f"{out}/oracle_sql.json"))
results = {}
for name, sql in sorted(oracle.items()):
    try:
        got = pd.read_parquet(f"{out}/{name}")
    except Exception as e:
        print(f"{name}: NO SPARK OUTPUT {e}")
        results[name] = {"status": "no_spark_output"}
        continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR {e}")
        results[name] = {"status": "oracle_sql_error"}
        continue
    g = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
    e = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).reset_index(drop=True)
    if sorted(got.columns) != sorted(exp.columns):
        print(f"{name}: SCHEMA MISMATCH spark={sorted(got.columns)} duck={sorted(exp.columns)}")
        results[name] = {"status": "schema_mismatch"}
        continue
    if len(g) != len(e):
        print(f"{name}: ROWCOUNT {len(g)} vs {len(e)}")
        results[name] = {"status": "rowcount_mismatch", "spark_rows": len(g), "oracle_rows": len(e)}
        continue
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
    results[name] = {"status": "ok" if ok else "value_mismatch", "rows": len(g)}

if json_out:
    summary = {
        "datadir": datadir,
        "oracle_rows_total": len(results),
        "hash_match": sum(1 for r in results.values() if r["status"] == "ok"),
        "mismatch": sorted(k for k, r in results.items() if r["status"] != "ok"),
        "per_query": results,
    }
    with open(json_out, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"wrote {json_out}: {summary['hash_match']}/{summary['oracle_rows_total']} hash_match")
