#!/usr/bin/env python3
"""Analyze the interleaved A/B bench (tools/ab_bench.sh outputs):
per-variant min-of-passes, then the per-query r12/r11 ratio distribution
over the comparable query set. Decides whether the r11->r12 drift
follows the JAR (localized or uniform code regression) or the SESSION
(both variants equally fast/slow when measured side by side)."""
import json, statistics, sys

def load(v):
    qs = {}
    for i in (1, 2):
        try:
            with open(f"/tmp/ab_{v}_{i}.json") as f:
                d = json.load(f)
            for k, t in d["queries"].items():
                qs[k] = min(qs.get(k, 1e9), t)
        except FileNotFoundError:
            pass
    return qs

a = load("r11")
b = load("r12")
common = sorted(set(a) & set(b))
ratios = sorted((b[k] / a[k], k) for k in common if a[k] > 0.05)
med = statistics.median(r for r, _ in ratios)
ta, tb = sum(a[k] for k in common), sum(b[k] for k in common)
print(f"common queries: {len(common)}  (ratio set: {len(ratios)} with r11>50ms)")
print(f"total r11={ta:.1f}s r12={tb:.1f}s  ratio={tb/ta:.3f}")
print(f"per-query r12/r11 median={med:.3f} "
      f"p10={ratios[len(ratios)//10][0]:.3f} p90={ratios[9*len(ratios)//10][0]:.3f}")
print("slowest-growing 8:")
for r, k in ratios[-8:]:
    print(f"  {k}: {a[k]:.2f}s -> {b[k]:.2f}s ({r:.2f}x)")
print("fastest-shrinking 5:")
for r, k in ratios[:5]:
    print(f"  {k}: {a[k]:.2f}s -> {b[k]:.2f}s ({r:.2f}x)")
# verdict
if med > 1.08:
    print(f"VERDICT: drift FOLLOWS THE JAR (median {med:.3f} in one session)")
else:
    print(f"VERDICT: drift follows the SESSION, not the jar (median {med:.3f} "
          "side-by-side) — the r12 round reading was environment.")
