#!/usr/bin/env python3
"""Per-query job profile from a Spark event log written by a Bench run
with spark.eventLog.enabled=true (Bench labels every job
"bench:<query>" via setJobDescription).

For each query: job count, summed job wall-clock, and the biggest jobs
(duration, first-stage name) — the evidence trail for "where do the
seconds live" (guide §1). Driver-side gaps show up as the difference
between the bench's per-query seconds and the summed job wall.

Usage: tools/evlog_profile.py <event-log-file> [query-prefix]
"""
import json, sys, collections

path = sys.argv[1]
prefix = sys.argv[2] if len(sys.argv) > 2 else ""

jobs = {}          # jobId -> dict(desc, t0, t1, stages)
stage_names = {}   # stageId -> name

with open(path) as f:
    for line in f:
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jid = e["Job ID"]
            desc = (e.get("Properties") or {}).get("spark.job.description", "")
            jobs[jid] = {"desc": desc, "t0": e["Submission Time"], "t1": None,
                         "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])]}
            for s in e.get("Stage Infos", []):
                stage_names[s["Stage ID"]] = s.get("Stage Name", "")
        elif ev == "SparkListenerJobEnd":
            jid = e["Job ID"]
            if jid in jobs:
                jobs[jid]["t1"] = e["Completion Time"]

per_q = collections.defaultdict(list)
for jid, j in sorted(jobs.items()):
    q = j["desc"].removeprefix("bench:") if j["desc"].startswith("bench:") else "(unlabeled)"
    dur = (j["t1"] - j["t0"]) / 1000.0 if j["t1"] else float("nan")
    per_q[q].append((jid, dur, j["stages"]))

tot_all = 0.0
rows = []
for q, js in per_q.items():
    if prefix and not q.startswith(prefix):
        continue
    wall = sum(d for _, d, _ in js if d == d)
    tot_all += wall
    rows.append((wall, q, js))

for wall, q, js in sorted(rows, reverse=True):
    print(f"\n== {q}: {len(js)} jobs, {wall:.2f}s summed job wall")
    for jid, dur, stages in sorted(js, key=lambda x: -(x[1] if x[1] == x[1] else 0))[:12]:
        name = stage_names.get(stages[0], "?") if stages else "?"
        print(f"   job {jid:4d}  {dur:6.2f}s  {len(stages)} stages  {name[:90]}")
print(f"\nTOTAL summed job wall: {tot_all:.2f}s over {len(rows)} queries")
