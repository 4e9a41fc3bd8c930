#!/usr/bin/env python3
"""Round-15 cache-class residency A/B analysis (SCALING.md r15 follow-up 1).

Method = the r14 instrument that convicted the r13 shingle frames: one
quiet boot, full 146-query suite per arm — baseline (all session caches
resident) vs one arm per cache class with that class excluded via
SPARK_GRAFT_NO_CACHE. A class whose residency taxes the suite shows the
baseline's NON-consumer mins sitting above the excluded arm's; the class's
own consumers are expected to slow under exclusion (they recompute).

Outputs, per arm:
  - consumer set (queries whose min slows >25% under exclusion, i.e. the
    recompute cost the residency saves)
  - non-consumer suite tax = median over non-consumers of
    baseline_min / excluded_min (>1 --> residency costs the rest of the
    suite; r13's shingle frames measured 1.23 here)
  - total residency verdict: keep resident iff consumer saving outweighs
    any non-consumer tax.
"""
import json, statistics, sys, os

OUT = sys.argv[1] if len(sys.argv) > 1 else "tools/ab_r15"

def load(name):
    p = os.path.join(OUT, f"ab_{name}.json")
    if not os.path.exists(p):
        return None
    d = json.load(open(p))
    mins = {q: min(v) for q, v in d["raw"].items()}
    meds = {q: statistics.median(v) for q, v in d["raw"].items()}
    return {"mins": mins, "meds": meds, "total": d["value"],
            "drift": d["calib"]["drift"], "wall": d["wall"],
            "copy_build": d.get("copy_build_secs")}

base = load("baseline")
if base is None:
    sys.exit(f"no baseline arm at {OUT}/ab_baseline.json — run tools/ab_cache_classes.sh first")
base2 = load("baseline2")
arms = ["no_band", "no_simhash", "no_modality", "no_termfreq"]

print(f"baseline : total {base['total']:7.2f}s drift {base['drift']:.3f} wall {base['wall']:.1f}")
if base2:
    print(f"baseline2: total {base2['total']:7.2f}s drift {base2['drift']:.3f} wall {base2['wall']:.1f}")
    # drift bracket: per-query min ratio baseline2/baseline ~1.0 means the
    # boot stayed quiet across the sweep and cross-arm ratios are trustworthy
    rs = sorted(base2["mins"][q] / base["mins"][q] for q in base["mins"]
                if base["mins"][q] > 0 and q in base2["mins"])
    print(f"  bracket baseline2/baseline min-ratio: median {statistics.median(rs):.3f} "
          f"p10 {rs[len(rs)//10]:.3f} p90 {rs[-len(rs)//10]:.3f}")

# The published adjudication (SCALING.md r15 follow-up 1, 0.89-0.95) is
# computed vs the PER-QUERY MIN OF BOTH BASELINES: with two same-boot
# baseline arms, the min-of-both is the tighter noise floor, so a
# residency "tax" has to clear both boots' best to count.
ref = ({q: min(v, base2["mins"][q]) for q, v in base["mins"].items() if q in base2["mins"]}
       if base2 else base["mins"])

for arm in arms:
    a = load(arm)
    if a is None:
        print(f"\n== {arm}: MISSING")
        continue
    ratios = {q: a["mins"][q] / ref[q]
              for q in ref if ref[q] > 0 and a["mins"].get(q, 0) > 0}
    consumers = {q for q, r in ratios.items() if r > 1.25}
    noncon = [q for q in ratios if q not in consumers]
    cons_cost = sum(a["mins"][q] - ref[q] for q in consumers)
    print(f"\n== {arm}: total {a['total']:7.2f}s drift {a['drift']:.3f}")
    print(f"  consumers slowed >1.25x under exclusion ({len(consumers)}): "
          f"{sorted(consumers)}")
    print(f"  recompute cost if evicted: +{cons_cost:.2f}s across consumers (min-stat)")
    if noncon:
        # tax levied on the rest of the suite by keeping the class resident
        tax = statistics.median(ref[q] / a["mins"][q] for q in noncon)
        print(f"  NON-consumer suite tax of residency: median {tax:.3f} "
              f"(r13 shingle frames measured 1.23 here; ~1.00 = residency is free)")
        top = sorted(((ref[q] / a["mins"][q], q) for q in noncon), reverse=True)[:8]
        print("  top non-consumer speedups when excluded: "
              + ", ".join(f"{q}={r:.2f}" for r, q in top))
    else:
        print("  NON-consumer suite tax: n/a (every query classified as a consumer)")
