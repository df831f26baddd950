#!/usr/bin/env python3
"""Build a 20x-density stress expansion of an sf directory (driver-side
tooling, not library code) — the recipe behind BASELINE.md's stress
tables.

- documents: each doc + (REPS-1) perturbed copies is the historical
  recipe — pass a pre-perturbed documents.parquet as the 4th argument
  to reproduce the recorded rows; without one this script replicates
  verbatim with doc_id offsets (worst-case EXACT-dup density, a
  HARSHER corpus: every span/shingle df multiplies by reps).
- events / orders / lineitem: REPS copies with per-replica key offsets —
  per-group structure (funnels, baskets) is preserved while group
  counts scale.
- embeddings: each vector + (REPS-1) deterministic scaled near-copies
  (x * (1 + 0.01r)); replica 0 keeps original ids so the vec_id < 10
  query set and vec_id % 50 centroid seeds stay meaningful.

Usage: make_stress.py <sfDir> <outDir> [reps=20] [perturbedDocsParquet]
"""
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def replicate(sf, out, name, offsets, reps):
    t = pq.read_table(f"{sf}/{name}.parquet")
    chunks = []
    for r in range(reps):
        cols = []
        for field in t.schema:
            col = t[field.name]
            if field.name in offsets:
                col = pc.add(col, offsets[field.name] * r)
            cols.append(col)
        chunks.append(pa.table(cols, schema=t.schema))
    res = pa.concat_tables(chunks)
    pq.write_table(res, f"{out}/{name}.parquet")
    print(name, res.num_rows)


EMB_STRIDE = 10_000  # vec_id replica offset (the recorded-run value)


def expand_embeddings(sf, out, reps):
    t = pq.read_table(f"{sf}/embeddings.parquet")
    n = t.num_rows
    assert n <= EMB_STRIDE, (
        f"{n} vectors >= stride {EMB_STRIDE}: replica vec_ids would "
        "collide (breaks every vec_id equi-join); raise EMB_STRIDE")
    emb = t["embedding"].combine_chunks()
    flat = np.asarray(emb.values, dtype=np.float32).reshape(n, -1)
    vid = np.asarray(t["vec_id"].combine_chunks(), dtype=np.int64)
    lab = np.asarray(t["label"].combine_chunks(), dtype=np.int32)
    dim = flat.shape[1]
    parts = []
    for r in range(reps):
        scaled = (flat * (1.0 + 0.01 * r)).astype(np.float32)
        arr = pa.FixedSizeListArray.from_arrays(pa.array(scaled.reshape(-1)), dim)
        arr = arr.cast(t.schema.field("embedding").type)
        parts.append(pa.table(
            [pa.array(vid + r * EMB_STRIDE), arr, pa.array(lab)], schema=t.schema))
    res = pa.concat_tables(parts)
    pq.write_table(res, f"{out}/embeddings.parquet")
    print("embeddings", res.num_rows)


def main():
    sf, out = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    docs_src = sys.argv[4] if len(sys.argv) > 4 else None
    os.makedirs(out, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part"]:
        shutil.copy(f"{sf}/{t}.parquet", f"{out}/{t}.parquet")
    if docs_src:  # pre-perturbed corpus (the recorded-run shape)
        shutil.copy(docs_src, f"{out}/documents.parquet")
        print("documents", pq.ParquetFile(f"{out}/documents.parquet").metadata.num_rows,
              "(from", docs_src + ")")
    else:
        replicate(sf, out, "documents", {"doc_id": 1_000_000}, reps)
    replicate(sf, out, "events", {"event_id": 10_000_000, "user_id": 1_000_000}, reps)
    replicate(sf, out, "orders", {"o_orderkey": 10_000_000, "o_custkey": 1_000_000}, reps)
    replicate(sf, out, "lineitem", {"l_orderkey": 10_000_000}, reps)
    expand_embeddings(sf, out, reps)


main()
