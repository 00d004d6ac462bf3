#!/usr/bin/env python3
"""Bench regression gate — MIN-of-N protocol (round-12).

Usage: bench_compare.py <baseline.json> <candidate.json> [factor]

Compares per-query MINIMUM times between two graft.Bench JSON outputs
(the `spread` key's [min, median, max] triples; falls back to the
`queries` medians when a side predates the spread field). The gate is
min-based because medians on a shared VM are load-sensitive — the
round-11 record shows same-code medians moving 0.5 -> 2.8 s while mins
held — so a REGRESSION is "the candidate's best case got slower", i.e.
cand_min > factor * base_min (default 2.0, the recorded 2x envelope),
with a 0.3 s absolute floor so sub-second queries don't trip on noise.

Exit 1 when any query regresses; prints the offenders. Queries present
on only one side are reported informationally, never gated (new or
retired entries are a coverage change, not a perf change).
"""
import json
import sys


def load(path):
    with open(path) as f:
        doc = json.load(f)
    spread = doc.get("spread") or {}
    out = {q: v[0] for q, v in spread.items()}
    for q, med in (doc.get("queries") or {}).items():
        out.setdefault(q, med)
    return out, set(doc.get("failed") or [])


def main():
    base_path, cand_path = sys.argv[1], sys.argv[2]
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    floor = 0.3  # seconds: below this, ratios are scheduler noise
    base, _ = load(base_path)
    cand, cand_failed = load(cand_path)
    shared = sorted(set(base) & set(cand))
    regressions = []
    broken = []
    for q in shared:
        b, c = base[q], cand[q]
        if c > factor * b and c - b > floor:
            regressions.append((q, b, c))
    for q in sorted(set(cand) - set(base)):
        print(f"  [new] {q}: {cand[q]:.2f}s (no baseline)")
    # a query in the candidate's failed list but absent from BOTH maps
    # failed every repeat — including a brand-NEW query that never
    # worked; without this it would be invisible to the gate entirely
    for q in sorted(cand_failed - set(cand) - set(base)):
        broken.append(q)
        print(f"  [BROKEN] {q}: new query fails every repeat")
    for q in sorted(set(base) - set(cand)):
        # a baseline query with every candidate repeat FAILED is the
        # worst regression there is, not a coverage change — Bench
        # omits all-failed queries from spread/queries but names them
        # in `failed`; only a genuinely retired query is informational
        if q in cand_failed:
            broken.append(q)
            print(f"  [BROKEN] {q}: was {base[q]:.2f}s, now fails every repeat")
        else:
            print(f"  [gone] {q}: was {base[q]:.2f}s (retired?)")
    for q, b, c in sorted(regressions, key=lambda r: r[2] / r[1], reverse=True):
        print(f"  [REGRESSION] {q}: min {b:.2f}s -> {c:.2f}s "
              f"({c / b:.1f}x > {factor}x gate)")
    tot_b = sum(base[q] for q in shared)
    tot_c = sum(cand[q] for q in shared)
    print(f"{len(shared)} shared queries: sum-of-mins "
          f"{tot_b:.1f}s -> {tot_c:.1f}s "
          f"({len(regressions)} regression(s), {len(broken)} broken)")
    sys.exit(1 if regressions or broken else 0)


if __name__ == "__main__":
    main()
