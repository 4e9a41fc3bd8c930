#!/usr/bin/env python3
"""Round-18: validate the r17 recovery formula against its own regime map
(VERDICT r17 task #3; SCALING.md r17 follow-up 1).

The formula as published:

    recovery ≈ floor + GET_latency × opens_per_partition × ceil(parts/slots)
                     + bytes / bandwidth

Inputs are the 15 committed r17 runs (tools/tier_r17/recoverythr*):
12 regime-map cells (3 stores × 3 cadences × 2 reps, 32 partitions) and
3 partition-sweep cells (8/32/64 partitions, GET-heavy store). Store
parameters are encoded in the run series (recovery_slope.sh r17 arms):
  recoverythr_*     GET 25 ms,  bw  64 MB/s   (bandwidth-bound)
  recoverythrlat_*  GET 100 ms, bw 256 MB/s   (GET-dominant)
  recoverythrlat2_* GET 200 ms, bw 512 MB/s   (GET-heavy)
  recoverythrp{8,32,64}_* = GET-heavy at that partition count

Three models are scored; floor (and, where noted, a lane efficiency η)
are fit by least squares on the 12 regime cells ONLY — the 3 sweep
cells are out-of-sample:

  A. published-additive: pred = F + get·oppp·waves + mb/bw (F fit)
  B. eta-additive:       pred = F + η·get·oppp·waves + mb/bw (F, η fit)
  C. eta-max:            pred = F + max(η·get·oppp·waves, mb/bw)

Output: tools/tier_r18/formula_check.json with per-run
predicted/measured/residual for each model + the fit parameters, and a
human table on stdout. The SCALING.md round-18 addendum carries the
verdict prose.
"""
import glob
import json
import math
import os
import statistics
import sys

REPO = sys.argv[1] if len(sys.argv) > 1 else "."
SLOTS = 32

SERIES = [  # (prefix, get_s, bw_mbps) — longest prefix wins
    ("recoverythrlat2_", 0.200, 512),
    ("recoverythrlat_", 0.100, 256),
    ("recoverythrp8_", 0.200, 512),
    ("recoverythrp32_", 0.200, 512),
    ("recoverythrp64_", 0.200, 512),
    ("recoverythr_", 0.025, 64),
]


def cells():
    out = []
    for f in sorted(glob.glob(os.path.join(REPO, "tools/tier_r17/recoverythr*_md*.json"))):
        name = os.path.basename(f)
        d = json.load(open(f))
        get = bw = None
        for pre, g, b in SERIES:
            if name.startswith(pre):
                get, bw = g, b
                break
        parts = 8 if "p8_" in name else 64 if "p64_" in name else 32
        sweep = any(t in name for t in ("p8_", "p32_", "p64_"))
        waves = math.ceil(parts / SLOTS)
        oppp = d["throttle_opens"] / parts
        out.append(dict(
            name=name, get_s=get, bw_mbps=bw, parts=parts, waves=waves,
            opens=d["throttle_opens"], opens_per_part=round(oppp, 1),
            read_mb=d["throttle_read_mb"], measured_s=d["recovery_s"],
            get_term_s=round(get * oppp * waves, 3),
            bw_term_s=round(d["throttle_read_mb"] / bw, 3),
            sweep=sweep))
    return out


def fit_eta_f(reg, compose):
    """Least-squares (F, η) for pred = F + compose(η·get_term, bw_term).
    Additive compose is closed-form; max compose via η grid."""
    best = None
    for eta in [i / 200 for i in range(40, 241)]:
        xs = [compose(eta * c["get_term_s"], c["bw_term_s"]) for c in reg]
        f = statistics.mean(c["measured_s"] - x for c, x in zip(reg, xs))
        sse = sum((f + x - c["measured_s"]) ** 2 for c, x in zip(reg, xs))
        if best is None or sse < best[0]:
            best = (sse, eta, f)
    sse, eta, f = best
    return f, eta, math.sqrt(sse / len(reg))


def main():
    cs = cells()
    reg = [c for c in cs if not c["sweep"]]

    # Model A: published additive, η pinned at 1, F least-squares.
    f_a = statistics.mean(c["measured_s"] - c["get_term_s"] - c["bw_term_s"] for c in reg)
    # Model B: additive with lane efficiency.
    f_b, eta_b, rmse_b = fit_eta_f(reg, lambda g, b: g + b)
    # Model C: max composition with lane efficiency.
    f_c, eta_c, rmse_c = fit_eta_f(reg, lambda g, b: max(g, b))

    models = {
        "A_published_additive": dict(floor_s=round(f_a, 2), eta=1.0),
        "B_eta_additive": dict(floor_s=round(f_b, 2), eta=eta_b),
        "C_eta_max": dict(floor_s=round(f_c, 2), eta=eta_c),
    }

    def pred(m, c):
        if m == "A_published_additive":
            return f_a + c["get_term_s"] + c["bw_term_s"]
        if m == "B_eta_additive":
            return f_b + eta_b * c["get_term_s"] + c["bw_term_s"]
        return f_c + max(eta_c * c["get_term_s"], c["bw_term_s"])

    rows = []
    print(f"{'run':34s} {'meas':>6s}" + "".join(f" {m.split('_')[0]:>5s}p {m.split('_')[0]:>5s}%" for m in models))
    for c in cs:
        row = dict(c)
        for m in models:
            p = pred(m, c)
            row[f"pred_{m}"] = round(p, 2)
            row[f"resid_pct_{m}"] = round(100 * (p - c["measured_s"]) / c["measured_s"], 1)
        rows.append(row)
        print(f"{c['name']:34s} {c['measured_s']:6.2f}" + "".join(
            f" {row[f'pred_{m}']:6.2f} {row[f'resid_pct_{m}']:6.1f}" for m in models)
            + ("  SWEEP" if c["sweep"] else ""))

    def worst(m, pool):
        return max(abs(r[f"resid_pct_{m}"]) for r in pool)

    regr = [r for r in rows if not r["sweep"]]
    swr = [r for r in rows if r["sweep"]]
    summary = {m: dict(models[m],
                       worst_regime_resid_pct=worst(m, regr),
                       worst_sweep_resid_pct=worst(m, swr))
               for m in models}
    print(json.dumps(summary, indent=2))

    outdir = os.path.join(REPO, "tools/tier_r18")
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "formula_check.json"), "w") as fh:
        json.dump(dict(slots=SLOTS, models=summary, runs=rows), fh, indent=1)
    print(f"wrote {outdir}/formula_check.json")


if __name__ == "__main__":
    main()
