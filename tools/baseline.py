#!/usr/bin/env python3
"""Measure single-node baselines for BASELINE.md (driver-side tooling, not
library code).

Two baselines, both on this machine at a given SF dir:

1. reference-equivalent Python: per-row loops with the same semantics as
   the reference pipeline stages (stream rows, regex/arith per row) — the
   shape of jacobwarren/social-media-ai-engineering-etl's jsonl stages.
2. DuckDB: the engine's own oracle SQL (oracle_sql.json from a Verify
   run) executed by DuckDB — a strong single-node columnar competitor.

Usage: baseline.py <sfDir> <verifyOutDir-with-oracle_sql.json>
Prints a markdown table body; BASELINE.md wraps it.
"""
import hashlib
import json
import re
import statistics
import sys
import time

import duckdb
import pyarrow.parquet as pq

EMOJI_RE = re.compile(
    "[\U0001F000-\U0001FAFF☀-➿️←-⇿⬀-⯿]")
TOKEN_RE = re.compile(r"\s+")


def timed(fn):
    t0 = time.perf_counter()
    n = fn()
    return time.perf_counter() - t0, n


def py_baselines(sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    out = {}

    def p01():  # 1-find-gradient.py: ratio, quantile cutoffs, tiers
        ratios = []
        for d in docs:
            i = d["doc_id"]
            r = min(50000, ((i * 13) % 50 + (i * 7) % 500 + (i * 3) % 20)
                    * 1000000 // (100 + (i * 37) % 9901))
            ratios.append(r)
        qs = statistics.quantiles(sorted(ratios), n=100, method="inclusive")
        top, bot = qs[79], qs[39]
        tiers = ["A" if r >= top else ("C" if r < bot else "B") for r in ratios]
        return len(tiers)

    def p02():  # 2-label.py: emoji count/frequency/bins + length buckets
        n = 0
        for d in docs:
            t = d["text"]
            ec = len(EMOJI_RE.findall(t))
            fr = ec / len(t) if t else 0.0
            _ = ("none" if ec == 0 else "very low" if fr <= 0.0005 else
                 "low" if fr <= 0.001 else "medium" if fr <= 0.005 else
                 "high" if fr <= 0.01 else "extreme")
            _ = ("big" if len(t) >= 1501 else "mid" if len(t) >= 750 else "small")
            n += 1
        return n

    def p17():  # 17-writing-style.py / features/text_stats.py subset
        n = 0
        for d in docs:
            t = d["text"]
            toks = [x for x in TOKEN_RE.split(t) if x]
            _ = len(set(toks))
            _ = sum(1 for s in re.split(r"[.!?]+", t) if s.strip())
            _ = t.count("\n"), t.count("."), t.count(","), t.count("!")
            _ = sum(1 for l in t.split("\n") if re.match(r"^\s*[0-9]+[.)]\s+", l))
            n += 1
        return n

    def rw():  # training/rewards/*: per-row scalar scores
        n = 0
        for d in docs:
            t = d["text"]
            _ = len(t)
            _ = len(re.findall(r"#\w+", t))
            _ = len(EMOJI_RE.findall(t))
            _ = len(re.findall(r"https?://\S+", t))
            _ = t.count("\n\n")
            toks = [x for x in TOKEN_RE.split(t) if x]
            _ = len(set(toks)) / len(toks) if toks else 0.0
            n += 1
        return n

    def dd_exact():  # normalized-hash exact dedup
        seen = {}
        for d in docs:
            fp = hashlib.md5(
                re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", "", d["text"].lower()))
                .encode()).hexdigest()
            seen.setdefault(fp, d["doc_id"])
        return len(seen)

    def dd_ngram():  # 3-gram shingle inverted index + pair counts
        from collections import defaultdict
        sh = {}
        for d in docs:
            toks = [x for x in TOKEN_RE.split(d["text"]) if x]
            ss = set(" ".join(toks[i:i + 3]) for i in range(max(1, len(toks) - 2)))
            sh[d["doc_id"]] = ss
        posting = defaultdict(list)
        for i, ss in sh.items():
            for s in ss:
                posting[s].append(i)
        pairs = defaultdict(int)
        for s, ids in posting.items():
            if len(ids) > 100:
                continue
            for a in range(len(ids)):
                for b in range(a + 1, len(ids)):
                    pairs[(min(ids[a], ids[b]), max(ids[a], ids[b]))] += 1
        out = [(a, b, c) for (a, b), c in pairs.items()
               if c * 1000000 // (len(sh[a]) + len(sh[b]) - c) >= 200000]
        return len(out)

    for name, fn in [("p01_engagement", p01), ("p02_label", p02),
                     ("p17_style", p17), ("rw_rewards", rw),
                     ("dd_exact", dd_exact), ("dd_ngram_jaccard", dd_ngram)]:
        secs, n = timed(fn)
        out[name] = secs
    return out


def duckdb_baselines(sf_dir, oracle_path):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    out = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        out[name] = time.perf_counter() - t0
    return out


def main():
    sf_dir, verify_dir = sys.argv[1], sys.argv[2]
    py = py_baselines(sf_dir)
    db = duckdb_baselines(sf_dir, f"{verify_dir}/oracle_sql.json")
    print(json.dumps({"python_ref_equiv": py, "duckdb_oracle": db}, indent=1))


main()
