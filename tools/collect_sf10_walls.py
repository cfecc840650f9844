#!/usr/bin/env python3
"""Collect per-query scale-drill Verify walls from batch logs into a
BENCH-shaped artifact, so 100x-scale timings are diffable round-over-round
(VERDICT r10 item 2): {"metric": ..., "unit": "sec", "sf": N,
"queries": {name: seconds}}.

Walls come from graft.Verify's "[verify] done  <query> (N s)" stderr lines.
Logs are applied IN ARGUMENT ORDER and later logs override earlier ones —
pass re-run/fix-up logs last so the freshest wall wins.

Usage: tools/collect_sf10_walls.py <out.json> <sf> <log1> [log2 ...]
"""
import json
import re
import sys

out, sf = sys.argv[1], float(sys.argv[2])
walls = {}
for f in sys.argv[3:]:
    for m in re.finditer(r"\[verify\] done  (\w+) \(([0-9.]+) s\)", open(f).read()):
        walls[m.group(1)] = float(m.group(2))
doc = {"metric": "sf_drill_verify_wall", "unit": "sec", "sf": sf,
       "value": round(sum(walls.values()), 1), "n_queries": len(walls),
       "queries": dict(sorted(walls.items()))}
json.dump(doc, open(out, "w"), indent=1)
print(f"[collect] {out}: {len(walls)} queries, total {doc['value']} s")
