#!/usr/bin/env python3
"""Per-query bench regression gate.

Diffs two Bench outputs and flags per-query moves beyond a ratio threshold
on queries present in both — the commit-time tripwire for the class of
surprise where a refactor measured on two queries silently regresses a
third (round 6 shipped a 6.7x regression on ta_bpe_pairs that way).

Usage: bench_delta.py <old.json> <new.json> [ratio=1.5] [floor=0.3]

Accepts either graft.Bench's own output line ({"queries": {...}}) or the
driver's round wrapper ({"parsed": {...}}). Moves are only flagged when the
absolute delta also exceeds `floor` seconds — sub-second queries jitter by
large ratios from JIT/scheduling alone. Exit 1 iff regressions were found.
"""
import json, sys


def load(path):
    d = json.load(open(path))
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    if "queries" not in d:
        sys.exit(f"{path}: no per-query data (driver wrapper with parsed=null? "
                 "use the round's committed bench_out.json instead)")
    if d.get("only"):
        print(f"NOTE {path}: subset run (only={d['only']}) — totals are "
              "partial; per-query deltas on shared cells only")
    if d.get("partial"):
        print(f"NOTE {path}: partial (interrupted) run")
    degraded = set(d.get("degraded") or []) | set(d.get("degraded2") or [])
    if degraded:
        print(f"NOTE {path}: {len(degraded)} deadline-degraded single-rep "
              "cells — expect extra jitter there")
    return d["queries"]


def main(old_path, new_path, ratio=1.5, floor=0.3):
    old, new = load(old_path), load(new_path)
    shared = sorted(set(old) & set(new))
    gone, added = sorted(set(old) - set(new)), sorted(set(new) - set(old))
    regressed, improved = [], []
    for q in shared:
        o, n = old[q], new[q]
        if n > o * ratio and n - o > floor:
            regressed.append((q, o, n))
        elif o > n * ratio and o - n > floor:
            improved.append((q, o, n))
    for q, o, n in sorted(regressed, key=lambda t: t[1] - t[2]):
        print(f"REGRESSED {q}: {o:.2f}s -> {n:.2f}s ({n / o:.1f}x)")
    for q, o, n in sorted(improved, key=lambda t: t[2] - t[1]):
        print(f"improved  {q}: {o:.2f}s -> {n:.2f}s ({o / n:.1f}x faster)")
    if gone:
        print(f"removed queries: {', '.join(gone)}")
    if added:
        print(f"new queries: {', '.join(added)}")
    ot, nt = sum(old[q] for q in shared), sum(new[q] for q in shared)
    print(f"shared-{len(shared)}-query total: {ot:.1f}s -> {nt:.1f}s; "
          f"{len(regressed)} regressed, {len(improved)} improved "
          f"(ratio>{ratio}, floor>{floor}s)")
    return 1 if regressed else 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    sys.exit(main(sys.argv[1], sys.argv[2],
                  float(sys.argv[3]) if len(sys.argv) > 3 else 1.5,
                  float(sys.argv[4]) if len(sys.argv) > 4 else 0.3))
