#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>
Loads each <verifyOutDir>/<name> parquet (Spark result), runs the
matching SQL from oracle_sql.json in DuckDB against the sfDir tables,
and compares after sorting columns by name and rows by all columns.
"""
import json, os, sys, math

# The unrolled 64-dim vector SQL makes DuckDB's bundled jemalloc retain
# tens of thousands of small virtual mappings across a ~100-query run;
# the PROCESS map count brushes vm.max_map_count (65530), at which point
# a 16 KB malloc fails with a spurious "bad allocation" OOM on whichever
# query runs next (observed: peak 65528 maps → flaky per-run failures;
# retain:false → peak 1156, zero failures). jemalloc only reads
# MALLOC_CONF at library load, hence the re-exec BEFORE import duckdb.
if os.environ.get("MALLOC_CONF") is None:
    os.environ["MALLOC_CONF"] = "retain:false,dirty_decay_ms:0,muzzy_decay_ms:0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

import duckdb

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out), [cols[i] for i in idx]

def sq8_nan_probe(con):
    """Exercise the DuckDB side of the sq8 NaN contract (Kernels.q8:
    NaN clips HIGH -> code 127). The synthetic embeddings contain no NaN,
    so without this probe the oracle mirror's claimed LEAST/GREATEST NaN
    ordering (VectorFunctions.sq8Sql) would rest on a comment alone.
    Vector ['nan', -0.5, 2.0, -2.0] quantizes to [127, -63, 127, -127];
    dotted with [1.0]*4 (codes [127]*4) = 127*(127-63+127-127) = 8128."""
    sql = """
      WITH p AS (SELECT ['nan'::DOUBLE, -0.5, 2.0, -2.0] AS a,
                        CAST([1.0, 1.0, 1.0, 1.0] AS DOUBLE[]) AS b)
      SELECT CAST(list_sum(list_transform(range(1, 5), i ->
        CAST(floor(GREATEST(-1.0, LEAST(1.0, a[i]))*127 + 0.5) AS BIGINT)
        * CAST(floor(GREATEST(-1.0, LEAST(1.0, b[i]))*127 + 0.5) AS BIGINT)))
        AS BIGINT) FROM p"""
    got = con.execute(sql).fetchone()[0]
    if got != 8128:
        print(f"FAIL sq8_nan_probe: DuckDB NaN clip gave {got}, want 8128 "
              "(sq8Sql's LEAST/GREATEST NaN ordering diverged from Kernels.q8)")
        sys.exit(1)

def connect(sf_dir):
    # At its default (80% of RAM) DuckDB malloc-OOMs on the dense
    # near-dup pair joins at sf0.1 (cur_verdict / dd_components /
    # dd_decisions); a capped limit spills and completes. A fixed 60GB
    # is machine-specific, so scale to detected RAM (never above the
    # default 80% line) and allow an env override.
    con = duckdb.connect()
    cap = os.environ.get("GRAFT_DUCKDB_MEM")
    if not cap:
        ram_gb = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE") / 2**30
        cap = f"{min(60, int(ram_gb * 0.6))}GB"
    con.execute(f"SET memory_limit='{cap}'")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = connect(sf_dir)
    sq8_nan_probe(con)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Honor the same subset knob Verify/Bench take, so a subset Verify run
    # compares only what it produced instead of reporting missing-parquet
    # FAILs for every unselected query (r14 verdict: subset evidence was
    # needlessly noisy). Unset = full-suite, the driver's mode.
    only = {n.strip() for n in os.environ.get("SPARK_GRAFT_ONLY", "").split(",")
            if n.strip()}
    if only:
        unknown = only - set(oracle)
        if unknown:
            # Hard failure, not a warning (r15 advice): a typo'd subset
            # used to filter oracle to {} and exit 0 with "0 pass, 0
            # fail" — a green verdict with zero comparisons performed.
            print(f"FAIL SPARK_GRAFT_ONLY names not in oracle_sql.json: "
                  f"{sorted(unknown)}")
            sys.exit(2)
        oracle = {n: s for n, s in oracle.items() if n in only}
        if not oracle:
            print("FAIL SPARK_GRAFT_ONLY filtered oracle_sql.json to empty")
            sys.exit(2)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        # One OOM retry on a FRESH connection (r12: a transient
        # memory window blanked ss_ivf_topk's row — an environmental
        # failure must not erase a round's evidence). The old
        # connection's buffer pool / temp state is dropped wholesale;
        # a second genuine OOM on a clean session is a real failure.
        for attempt in (1, 2):
            try:
                got = con.execute(
                    f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
                grows, gcols = got.fetchall(), [d[0] for d in got.description]
                want = con.execute(sql)
                wrows, wcols = want.fetchall(), [d[0] for d in want.description]
                err = None
                break
            except duckdb.OutOfMemoryException as e:
                err = e
                if attempt == 1:
                    print(f"RETRY {name}: oracle OOM, reconnecting ({e})")
                    try: con.close()
                    except Exception: pass
                    con = connect(sf_dir)
            except Exception as e:
                err = e
                break
        if err is not None:
            print(f"FAIL {name}: exception {err}")
            n_fail += 1
            continue
        g, gc = canon(grows, gcols)
        w, wc = canon(wrows, wcols)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
        elif g != w:
            diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print(f"FAIL {name}: {len(g)} vs {len(w)} rows; first diffs: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
