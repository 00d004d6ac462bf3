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

Load guard (round-15): Bench stamps cpus/load1 on its JSON line; a
side measured at load1 > 3 is load-contaminated (rounds 13 and 14
both committed benches at load1 ~5 that manufactured ~10 false
regressions each). The gate REFUSES to adjudicate such a pair (exit
2) unless --allow-loaded is passed, in which case it only warns.

Auto-adjudication (round-17 verdict item 1): --adjudicate re-runs any
flagged query through the trusted targeted protocol (Bench --repeat 5
--only ..., waiting for ambient load1 below the contamination
threshold first) and re-prices it with min(candidate, re-run) — the
manual "targeted 5-rep re-measure" that cleared sk5 in round 17, now
machinery. Exit reflects the POST-adjudication verdict; re-priced
queries print as [re-priced]. The candidate FILE is updated in place
(round-19 advice: the in-memory-only re-price made every later
comparison re-pay the adjudication): re-priced spread mins are
written back, the old numbers are preserved under "adjudication",
and "adjudicated": true is stamped — the close-out checklist
(VerifySurfaceSpec under GRAFT_CLOSEOUT=1) requires that stamp on
the committed closing bench.

Same-host assumption: wait_for_idle and the targeted re-run sample
THIS machine's load and run Bench locally, so adjudication is only
meaningful when bench_compare runs on the same box that produced the
candidate (true for the driver and the round workflow; a cross-host
adjudication would wait on the wrong machine's quiet window).
"""
import json
import os
import subprocess
import sys
import time


def load(path):
    with open(path) as f:
        doc = json.load(f)
    spread = doc.get("spread") or {}
    out = {q: v[0] for q, v in spread.items()}
    for q, med in (doc.get("queries") or {}).items():
        out.setdefault(q, med)
    return (out, set(doc.get("failed") or []), doc.get("load1"),
            doc.get("cpus"), doc.get("sf"))


def wait_for_idle(threshold, timeout_s=900, poll_s=30):
    """Block until THIS machine's ambient load1 drops under the
    contamination threshold (or the timeout passes) — the 'quiet
    window' the round-17 forensics had to hunt by hand. Only
    meaningful when bench_compare runs on the box that produced the
    candidate (see the module docstring's same-host note)."""
    t0 = time.time()
    while True:
        load1 = os.getloadavg()[0]
        if load1 <= threshold:
            return load1
        if time.time() - t0 > timeout_s:
            print(f"  [adjudicate] gave up waiting for idle "
                  f"(load1={load1:.2f} > {threshold:.1f} after {timeout_s}s); "
                  "re-running anyway — treat the re-price as a lower bound")
            return load1
        print(f"  [adjudicate] load1={load1:.2f} > {threshold:.1f}; "
              f"waiting {poll_s}s for a quiet window")
        time.sleep(poll_s)


def targeted_rerun(names, cpus, sf, repeat=5):
    """Re-measure `names` with Bench's --only protocol AT THE
    CANDIDATE'S OWN scale factor (review-caught: a re-run defaulting to
    sf0.1 against an sf1 candidate would 'exonerate' every real
    regression); returns the re-run's per-query mins (empty on any
    failure — adjudication then keeps the original numbers and the
    gate stays red)."""
    cmd = ["sbt", "-batch",
           f"runMain graft.Bench --repeat {repeat} --only {','.join(names)}"]
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus or 32))
    if sf:
        env["SPARK_GRAFT_SF_DIR"] = sf
    print(f"  [adjudicate] re-running {len(names)} flagged quer"
          f"{'y' if len(names) == 1 else 'ies'} x{repeat} reps: "
          f"{' '.join(cmd)}")
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=3600, env=env,
                             cwd=os.path.dirname(os.path.dirname(
                                 os.path.abspath(__file__))))
    except Exception as e:  # noqa: BLE001 — report, keep gate red
        print(f"  [adjudicate] re-run failed to launch: {e}")
        return {}
    # sbt prefixes forked stdout with "[info] ", so anchor on the
    # marker anywhere in the line and slice from it (review-by-use:
    # startswith silently discarded every re-run)
    line = next((ln[ln.index('{"metric"'):]
                 for ln in reversed(out.stdout.splitlines())
                 if '{"metric"' in ln), None)
    if out.returncode != 0 or line is None:
        print(f"  [adjudicate] re-run failed (exit {out.returncode}); "
              "keeping original numbers")
        return {}
    doc = json.loads(line)
    spread = doc.get("spread") or {}
    rerun = {q: v[0] for q, v in spread.items()}
    for q, med in (doc.get("queries") or {}).items():
        rerun.setdefault(q, med)
    return rerun


def max_load1(cpus):
    """Contamination threshold scaled to the box: 3.0 was calibrated on
    the 32-cpu runner (r13/r14 benches at ~4.4-5.0 manufactured false
    regressions; 1.5-2.2 adjudicated clean), so scale by cpus/32 with a
    floor of 1.0 — an absolute 3.0 would pass a saturated 4-core box."""
    return max(1.0, 3.0 * (cpus or 32) / 32.0)


def main():
    flags = {"--allow-loaded", "--adjudicate"}
    argv = [a for a in sys.argv[1:] if a not in flags]
    allow_loaded = "--allow-loaded" in sys.argv
    adjudicate = "--adjudicate" in sys.argv
    base_path, cand_path = argv[0], argv[1]
    factor = float(argv[2]) if len(argv) > 2 else 2.0
    floor = 0.3  # seconds: below this, ratios are scheduler noise
    base, _, base_load, base_cpus, base_sf = load(base_path)
    cand, cand_failed, cand_load, cand_cpus, cand_sf = load(cand_path)
    if base_sf and cand_sf and base_sf != cand_sf:
        print(f"refusing to compare different scale factors: "
              f"{base_path} is {base_sf}, {cand_path} is {cand_sf}")
        sys.exit(2)
    loaded = [(p, l, max_load1(c)) for p, l, c in
              ((base_path, base_load, base_cpus),
               (cand_path, cand_load, cand_cpus))
              if l is not None and l > max_load1(c)]
    for p, l, thr in loaded:
        print(f"  [LOAD] {p}: load1={l:.2f} > {thr:.1f} — "
              "measurements are load-contaminated")
    if loaded and not allow_loaded:
        print("refusing to adjudicate a load-contaminated bench "
              "(re-run Bench on an idle box, or pass --allow-loaded "
              "to warn-only); rounds 13/14 each produced ~10 false "
              "regressions this way")
        sys.exit(2)
    shared = sorted(set(base) & set(cand))

    def flag(prices):
        out = []
        for q in shared:
            b, c = base[q], prices[q]
            if c > factor * b and c - b > floor:
                out.append((q, b, c))
        return out

    regressions = flag(cand)
    broken = []
    repriced = {}
    if regressions and adjudicate:
        # the flag may be a load window, not a regression: re-run just
        # the flagged queries through the trusted 5-rep min protocol on
        # a quiet box and re-price with the best evidence either run
        # produced (a re-run can only EXONERATE — min() never worsens a
        # number, so a real regression stays red)
        wait_for_idle(max_load1(cand_cpus))
        rerun = targeted_rerun([q for q, _, _ in regressions], cand_cpus,
                               cand_sf)
        for q, new_min in rerun.items():
            if q in cand and new_min < cand[q]:
                print(f"  [re-priced] {q}: {cand[q]:.2f}s -> {new_min:.2f}s "
                      "(targeted 5-rep re-run)")
                repriced[q] = {"old_min": cand[q], "new_min": new_min}
                cand[q] = new_min
        regressions = flag(cand)
    if adjudicate:
        # persist the verdict so later comparisons against the committed
        # artifact see the cleared numbers instead of re-paying the
        # re-run (round-19 advice); stamped even with zero flags — the
        # stamp certifies "this artifact went through the protocol"
        with open(cand_path) as f:
            doc = json.load(f)
        for q, pr in repriced.items():
            if q in (doc.get("spread") or {}):
                doc["spread"][q][0] = pr["new_min"]
        if repriced:
            doc["adjudication"] = {**doc.get("adjudication", {}), **repriced}
        doc["adjudicated"] = True
        with open(cand_path, "w") as f:
            json.dump(doc, f, separators=(",", ":"))
            f.write("\n")
        print(f"  [adjudicate] stamped {cand_path} adjudicated "
              f"({len(repriced)} re-priced)")
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
