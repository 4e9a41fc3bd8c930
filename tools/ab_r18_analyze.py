#!/usr/bin/env python3
"""Round-18 same-boot worktree A/B: r17 binary vs r15 binary.

Trigger (VERDICT r17 task #1): the round-18 quiet-boot bench normalized
≥10% above r15's 50.9 s — the normalized-total trajectory has risen
three rounds running (50.9 → 58.8 → 63.2) on quiet-boot adjudications
that existed only in prose. This instrument settles binary-vs-ambient
the way r14's did: both binaries run the FULL suite alternately in one
boot window (r15: run1+run2 bracket the r17 run), so ambient applies to
both arms and the per-query min RATIO isolates the binary.

Reading: a real plan regression shows as specific queries with
r17/r15 min-ratio ≫ 1 while the rest sit at ~1.0; an ambient window
shows a uniform shift — median ≈ 1.0 with symmetric scatter.

Inputs: tools/ab_r18/ab_r15_run{1,2}.json, ab_r17_run2.json (each a
BENCH_LAST snapshot with raw per-rep times), plus
tools/bench_quiet_r18.json as the r17 arm's first run.
Output: tools/ab_r18/ab_verdict.json + stdout table.
"""
import json
import os
import statistics
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "tools/ab_r18"


def arm_mins(paths):
    # First-3-reps only: the guard's second-chance mechanism gives a
    # FLAGGED query 2 extra reps, and which arm flags depends on that
    # tree's bench_best.json — the r15 arm flagged ~10 small queries
    # (its recorded bests are lower) and harvested late quiet-moment
    # reps the r17 arm never ran. Truncating to the 3 scheduled reps
    # puts both arms on the same instrument; the raw full-rep data
    # stays in the per-run JSONs.
    mins = {}
    calibs = []
    missing = [p for p in paths if not os.path.exists(p)]
    if len(missing) == len(paths):
        sys.exit(f"ERROR: no input artifact exists for this arm: {missing}")
    if missing:
        print(f"note: arm missing {missing} (using the runs that exist)",
              file=sys.stderr)
    for p in paths:
        if not os.path.exists(p):
            continue
        d = json.load(open(p))
        calibs.append(d.get("calib", {}))
        for q, reps in d.get("raw", {}).items():
            m = min(reps[:3])
            if q not in mins or m < mins[q]:
                mins[q] = m
    return mins, calibs


def main():
    r15, c15 = arm_mins([f"{OUT}/ab_r15_run1.json", f"{OUT}/ab_r15_run2.json"])
    r17, c17 = arm_mins([f"{OUT}/ab_r17_run2.json", "tools/bench_quiet_r18.json"])
    common = sorted(set(r15) & set(r17))
    only = set(r15) ^ set(r17)
    ratios = {q: r17[q] / r15[q] for q in common if r15[q] > 0}
    rs = sorted(ratios.values())
    if not rs:
        sys.exit("ERROR: arms share no queries with nonzero r15 minima — "
                 f"check input paths under {OUT}/ (r15 arm has {len(r15)} "
                 f"queries, r17 arm has {len(r17)})")
    med = statistics.median(rs)
    q1, q3 = rs[len(rs) // 4], rs[3 * len(rs) // 4]
    # same noise floor as the bench guard: a ratio only counts as a
    # regression candidate if the absolute excess clears 0.3 s
    flags = {q: dict(ratio=round(r, 2), r15_min=round(r15[q], 3),
                     r17_min=round(r17[q], 3))
             for q, r in ratios.items()
             if r > 1.5 and (r17[q] - r15[q]) > 0.3}
    tot15 = sum(r15[q] for q in common)
    tot17 = sum(r17[q] for q in common)
    verdict = dict(
        common_queries=len(common), unmatched=sorted(only),
        median_ratio=round(med, 3), iqr=[round(q1, 3), round(q3, 3)],
        total_min_s={"r15": round(tot15, 1), "r17": round(tot17, 1),
                     "ratio": round(tot17 / tot15, 3)},
        calib={"r15_runs": c15, "r17_runs": c17},
        flagged=flags)
    print(json.dumps(verdict, indent=2))
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:10]
    print("\nworst 10 ratios (r17min/r15min):")
    for q, r in worst:
        print(f"  {q:28s} {r:5.2f}  ({r15[q]:.3f} -> {r17[q]:.3f})")
    best = sorted(ratios.items(), key=lambda kv: kv[1])[:5]
    print("best 5:")
    for q, r in best:
        print(f"  {q:28s} {r:5.2f}  ({r15[q]:.3f} -> {r17[q]:.3f})")
    with open(f"{OUT}/ab_verdict.json", "w") as fh:
        json.dump(verdict, fh, indent=1)
    print(f"\nwrote {OUT}/ab_verdict.json")


if __name__ == "__main__":
    main()
