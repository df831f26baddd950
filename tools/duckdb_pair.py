#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB at a given SF dir (same recipe as the
r8/r9 pair records: one session, memory_limit=60GB, jemalloc retain off)."""
import json, os, sys, time
if os.environ.get("_MALLOC_SET") != "1":
    os.environ["MALLOC_CONF"] = "retain:false"
    os.environ["_MALLOC_SET"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)
import duckdb
sf_dir, oracle_json, out = sys.argv[1], sys.argv[2], sys.argv[3]
sqls = json.load(open(oracle_json))
con = duckdb.connect()
con.execute("SET memory_limit='60GB'")
con.execute("SET threads TO 32")
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
res, total = {}, 0.0
for name in sorted(sqls):
    t0 = time.perf_counter()
    try:
        con.execute(sqls[name]).fetchall()
        dt = time.perf_counter() - t0
        res[name] = round(dt, 3); total += dt
        print(f"{name}: {dt:.3f}s", flush=True)
    except Exception as e:
        res[name] = None
        print(f"{name}: ERROR {str(e)[:120]}", flush=True)
json.dump({"total": round(total, 3), "n": sum(1 for v in res.values() if v is not None),
           "queries": res}, open(out, "w"), indent=1)
