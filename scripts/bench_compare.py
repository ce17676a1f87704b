#!/usr/bin/env python3
"""Compare two Bench JSON lines per-query (round-over-round).

Usage: python3 scripts/bench_compare.py OLD.json NEW.json [threshold=1.5]
Prints queries whose time changed by more than the threshold factor,
ignoring sub-second entries (pure overhead noise).
"""
import json, sys

old = json.load(open(sys.argv[1]))["queries"]
new = json.load(open(sys.argv[2]))["queries"]
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

print(f"old total={sum(old.values()):.1f}s ({len(old)} q)  "
      f"new total={sum(new.values()):.1f}s ({len(new)} q)")
for q in sorted(set(old) | set(new)):
    o, n = old.get(q), new.get(q)
    if o is None:
        print(f"  NEW      {q}: {n:.2f}s")
    elif n is None:
        print(f"  REMOVED  {q}: was {o:.2f}s")
    elif max(o, n) >= 1.0 and (n / o > thr or o / n > thr):
        print(f"  {'SLOWER' if n > o else 'FASTER'}   {q}: {o:.2f}s -> {n:.2f}s")
