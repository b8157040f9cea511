"""Machine-readable Space-Saving bound check for the scale-proof pass.

q11c_terms_sketch / st09_stream_topk share one exact-top-5 oracle that is
valid only while sketch capacity (200) >= live keys per group. A scale
derivation that pushes cardinality past the capacity puts the sketch in
its documented approximate regime — the hash compare then reports a
mismatch that is the sketch CONTRACT, not a bug. This script verifies the
contract itself: every reported count must be within the Space-Saving
guarantee |cnt - true_cnt| <= N_group / capacity (eps*N), recomputing
ground truth from the same derived events table.

The bound is deliberately TWO-SIDED: a single-node Space-Saving sketch
only overestimates, but the engine's distributed form merges
per-partition sketches, and a key evicted from some partition's sketch
loses that partition's contribution — so the merged count can UNDERcount
by up to the per-partition error sum, still bounded by eps*N over the
group. A one-sided (overestimate-only) check would flag the merge's
legitimate undercounts as contract violations.

Usage: python3 tools/check_spacesaving.py <verify_out_dir> <datadir> <out.json>
"""
import duckdb, json, sys
import pandas as pd

out, datadir, json_out = sys.argv[1], sys.argv[2], sys.argv[3]
cap = 200
con = duckdb.connect()
truth = con.sql(f"""
  SELECT event_type, CAST(user_id AS VARCHAR) AS item, COUNT(*) AS true_cnt
  FROM '{datadir}/events.parquet' GROUP BY 1, 2""").df()
n = con.sql(f"""
  SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS live_keys
  FROM '{datadir}/events.parquet' GROUP BY 1""").df()
report = {"capacity": cap,
          "bound": "abs(cnt - true_cnt) <= N_group/capacity (two-sided: the distributed merge can undercount evicted keys, single-node Space-Saving only overcounts)",
          "queries": {}}
all_ok = True
for q in ["q11c_terms_sketch", "st09_stream_topk"]:
    got = pd.read_parquet(f"{out}/{q}")
    m = got.merge(truth, on=["event_type", "item"], how="left").merge(n, on="event_type")
    m["true_cnt"] = m["true_cnt"].fillna(0)
    m["abs_err"] = (m["cnt"] - m["true_cnt"]).abs()
    m["bound"] = m["n"] / cap
    ok = bool((m["abs_err"] <= m["bound"]).all())
    all_ok = all_ok and ok
    report["queries"][q] = {
        "rows": int(len(m)),
        "live_keys_max": int(m["live_keys"].max()),
        "exact_regime": bool(m["live_keys"].max() <= cap),
        "max_abs_err": float(m["abs_err"].max()),
        "min_bound": float(m["bound"].min()),
        "within_bound": ok,
    }
report["all_within_bound"] = all_ok
with open(json_out, "w") as f:
    json.dump(report, f, indent=1)
print(json.dumps(report))
