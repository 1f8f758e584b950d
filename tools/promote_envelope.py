#!/usr/bin/env python3
"""Promote a bench ENVELOPE from two accepted quiet runs: per-query MAX of
the two runs' (already median-of-3) cells, for both scale points — the gate
then flags only moves beyond the worst quiet observation. Spreads are kept
from whichever run supplied the winning cell (diagnostic only).

Usage: promote_envelope.py <run1.json> <run2.json> <out.json>
"""
import json, sys


def merge(a, b, key):
    qa, qb = a.get(key) or {}, b.get(key) or {}
    out = {}
    for q in set(qa) | set(qb):
        if q in qa and q in qb:
            out[q] = max(qa[q], qb[q])
        else:
            out[q] = qa.get(q, qb.get(q))
    return out


def reject_non_full(d, path):
    """A subset (SPARK_GRAFT_BENCH_ONLY), partial (interrupted), or
    deadline-degraded/truncated artifact must never be promoted to the
    envelope — its 'total' looks like a full suite but is not (round-14
    ADVICE)."""
    assert not d.get("only"), f"{path}: subset run (only={d['only']}) — " \
        "promote only full-suite artifacts"
    assert not d.get("partial"), f"{path}: partial (interrupted) run"
    for k in ("degraded", "degraded2", "skipped", "skipped2"):
        assert not d.get(k), f"{path}: {k} cells present — the run ran " \
            "past its deadline; re-run in a quiet window"
    assert not d.get("degraded_n") and not d.get("skipped_n"), \
        f"{path}: deadline-degraded run"


def main(p1, p2, outp):
    a, b = json.load(open(p1)), json.load(open(p2))
    reject_non_full(a, p1)
    reject_non_full(b, p2)
    assert not a.get("failed") and not b.get("failed"), "failed queries"
    assert not a.get("failed2") and not b.get("failed2"), "failed sf2 queries"
    out = dict(a)
    for key, skey in (("queries", "spread"), ("queries2", "spread2")):
        merged = merge(a, b, key)
        out[key] = merged
        sa, sb = a.get(skey) or {}, b.get(skey) or {}
        out[skey] = {
            q: (sa.get(q) if (a.get(key) or {}).get(q) == merged[q]
                else sb.get(q)) or sa.get(q) or sb.get(q)
            for q in merged
            if sa.get(q) or sb.get(q)}
    out["value"] = round(sum(out["queries"].values()), 3)
    if out.get("queries2"):
        out["total2"] = round(sum(out["queries2"].values()), 3)
    json.dump(out, open(outp, "w"))
    n_max_a = sum(1 for q in out["queries"]
                  if (a["queries"].get(q)) == out["queries"][q])
    print(f"envelope: {len(out['queries'])} cells, sum {out['value']}s "
          f"(run1 {a['value']}s, run2 {b['value']}s); "
          f"{n_max_a} cells from run1")


if __name__ == "__main__":
    main(*sys.argv[1:4])
