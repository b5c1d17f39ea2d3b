#!/usr/bin/env python3
"""Assemble STRESS_r{N}.md's full-registry ratio table from two
graft.Stress 'all' runs: one pointed at the sf0.1 harness dir, one at
the 10x replica. Usage:
  python3 tools/stress_report.py /tmp/stress_sf01.json /tmp/stress_sf1.json
Prints a markdown table body (name, sf0.1 s, sf1 s, ratio, flag) sorted
by descending ratio, plus summary counts. Negative times = FAILED.
"""
import json, sys

def load(p):
    d = json.load(open(p))
    return d["queries"]

base, ten = load(sys.argv[1]), load(sys.argv[2])
rows = []
for name in sorted(ten):
    b, t = base.get(name), ten[name]
    if b is None:
        continue
    failed = b < 0 or t < 0
    # guard tiny denominators: ratios below 0.2s baseline are noise
    ratio = (t / b) if (not failed and b >= 0.2) else None
    rows.append((name, b, t, ratio, failed))

rows.sort(key=lambda r: -(r[3] or 0))
over, fails = [], []
print("| query | sf0.1 (s) | sf1 (s) | ratio |")
print("|---|---|---|---|")
for name, b, t, ratio, failed in rows:
    if failed:
        fails.append(name)
        print(f"| {name} | {abs(b):.2f} | {abs(t):.2f} | FAILED |")
        continue
    rs = f"{ratio:.1f}x" if ratio is not None else f"~ (base {b:.2f}s)"
    if ratio is not None and ratio > 5.0:
        over.append((name, ratio))
        rs += " !"
    print(f"| {name} | {b:.2f} | {t:.2f} | {rs} |")
print()
n_ratio = sum(1 for r in rows if r[3] is not None)
print(f"summary: {len(rows)} queries, {n_ratio} with measurable ratio, "
      f"{len(over)} above 5x for 10x data, {len(fails)} failed")
for name, ratio in over:
    print(f"  over-5x: {name} {ratio:.1f}x")
