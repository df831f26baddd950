#!/usr/bin/env python3
"""Convert a check_oracle.py log into the driver-style CORRECTNESS json
(rows/schema/hash booleans per query). PASS lines carry row counts; FAIL
lines carry the reason. Usage: oraclelog_to_json.py <log> <out.json>"""
import json, re, sys

log, out = sys.argv[1], sys.argv[2]
rec = {}
for line in open(log):
    m = re.match(r"PASS (\S+) \((\d+) rows\)", line)
    if m:
        rec[m.group(1)] = {"rows_match": True, "schema_match": True,
                           "hash_match": True, "rows": int(m.group(2)),
                           "err": None}
        continue
    m = re.match(r"FAIL (\S+): (.*)", line)
    if m:
        rec[m.group(1)] = {"rows_match": False, "schema_match": False,
                           "hash_match": False, "rows": None,
                           "err": m.group(2)[:300]}
json.dump(rec, open(out, "w"), indent=1)
print(f"{sum(1 for v in rec.values() if v['hash_match'])} pass / {len(rec)}")
