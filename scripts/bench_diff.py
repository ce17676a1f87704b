#!/usr/bin/env python3
"""Diff two bench_perquery.json artifacts (r13: the full per-query map
that no longer depends on the driver's stdout tail truncation).

  python3 scripts/bench_diff.py OLD.json NEW.json [min_delta_sec]

Prints queries whose wall moved more than max(min_delta_sec, 30%) in
either direction, plus added/removed queries and the context fields
(canary pair, warmup_skipped) needed to tell load from regression.
"""
import json
import sys


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    floor = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3

    for tag, b in (("old", old), ("new", new)):
        print(f"{tag}: total {b['total']}s / {b['n_queries']} queries / "
              f"{b['errors']} errors, canary {b['canary_start']}->{b['canary_end']}, "
              f"warmup_skipped {b['warmup_skipped']}, n_suspects {b['n_suspects']}")

    oq, nq = old["queries"], new["queries"]
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print("added:", ", ".join(f"{n} ({nq[n]}s)" for n in added))
    if removed:
        print("removed:", ", ".join(f"{n} ({oq[n]}s)" for n in removed))

    moved = []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        # sub-second pairs are per-query overhead noise (bench_compare.py floor)
        if max(a, b) < 1.0:
            continue
        delta = b - a
        if abs(delta) >= max(floor, 0.3 * max(a, 1e-9)):
            moved.append((delta, name, a, b))
    moved.sort(reverse=True)
    if not moved:
        print("no per-query moves beyond the noise floor")
    for delta, name, a, b in moved:
        # max() guard: an errored old run records 0.0 — show the move, don't crash
        print(f"  {name:30s} {a:7.3f} -> {b:7.3f}  ({delta:+.3f}s, {b / max(a, 1e-9):4.2f}x)")


if __name__ == "__main__":
    main()
