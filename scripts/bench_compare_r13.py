#!/usr/bin/env python
"""Render the r12->r13 per-query med3 comparison from the committed r12
BENCH_full.json (git show) vs the current artifact, for OPTIMIZATION_r13.md."""

from __future__ import annotations

import json
import math
import subprocess
import sys

old = json.loads(
    subprocess.run(
        ["git", "show", "73e495a:BENCH_full.json"],
        capture_output=True, text=True, check=True,
    ).stdout
)
new = json.load(open("BENCH_full.json"))
om, nm = old["queries_median3"], new["queries_median3"]
oc, nc = old["queries"], new["queries"]
common = sorted(set(om) & set(nm))
rows = []
for q in common:
    rows.append((om[q] / nm[q] if nm[q] else float("nan"), q))
rows.sort(reverse=True)
print(f"n_common={len(common)}")
print(f"med3 total: {sum(om[q] for q in common):.1f} -> {sum(nm[q] for q in common):.1f}")
print(f"cold total: {sum(oc[q] for q in common):.1f} -> {sum(nc[q] for q in common):.1f}")
g = math.exp(sum(math.log(r) for r, _ in rows if r > 0) / len(rows))
print(f"geomean med3 speedup: {g:.3f}")
imp = sum(1 for r, _ in rows if r > 1.1)
reg = sum(1 for r, _ in rows if r < 1 / 1.1)
print(f">10% improved: {imp}, >10% regressed: {reg}")
print("\ntop 20 improvements (med3 before -> after, x):")
for r, q in rows[:20]:
    print(f"  {q:35s} {om[q]:7.2f} -> {nm[q]:6.2f}  {r:5.2f}x")
print("\nregressions >10% (med3):")
for r, q in rows[::-1]:
    if r >= 1 / 1.1:
        break
    print(f"  {q:35s} {om[q]:7.2f} -> {nm[q]:6.2f}  {r:5.2f}x")
if len(sys.argv) > 1 and sys.argv[1] == "--heavy":
    print("\nheavy lane:", json.dumps(new.get("heavy_scaling", {}), indent=1)[:2000])
