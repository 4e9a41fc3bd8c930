#!/usr/bin/env python3
"""Round-19 recovery campaign analysis (VERDICT r18 tasks #3 and #4).

Reads tools/tier_r19/recoverythrl19*_md*_r1.json (written by
tools/recovery_r19.sh: md2 cells in base/LIST × maintenance-paused
on/off, two interleaved reps each, plus md39 base/LIST single anchors)
and reports:

  1. The maintenance-race term: unpaused − paused recovery at identical
     knobs — the r18 formula residual (~2 s on GET-heavy md2 cells,
     273→623 open variance), now measured instead of inferred.
  2. The clean md2 floor vs the r18 formula (models B/C from
     tools/tier_r18/formula_check.json, fitted on the r17 map):
     predicted from each PAUSED cell's own opens/bytes evidence.
  3. The md2 × LIST cell (ingest wall + recovery) that r18 dropped as
     ambient-poisoned — with the r19 heads/lists decomposition
     (lists = discovery only; heads = per-open HEADs; both pay
     list-latency, so the metadata term uses their SUM).

Usage: python3 tools/race_floor_r19.py [outDir] — writes
<outDir>/race_floor.json and a stdout table.
"""
import glob
import json
import math
import os
import re
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "tools/tier_r19"
GET_S, BW_MBPS, LIST_S, SLOTS = 0.200, 512, 0.200, 32


def load_cells():
    cells = []
    for f in sorted(glob.glob(os.path.join(OUT, "recoverythrl19*_md*_r1.json"))):
        name = os.path.basename(f)
        m = re.match(r"recoverythrl19(\w+?)(?:_rep(\d))?_md(\d+)_r1\.json", name)
        if not m:
            continue
        kind, rep, md = m.group(1), m.group(2) or "1", int(m.group(3))
        d = json.load(open(f))
        cells.append(dict(
            name=name, kind=kind, rep=int(rep), md=md,
            listy="list" in kind or kind == "anchorl",
            paused=d.get("maintenance_paused", False),
            recovery_s=d.get("recovery_s"), ingest_wall_s=d.get("wall_s"),
            eps=d.get("value"), debt=d.get("replay_changelogs"),
            snaps=d.get("snapshots"), opens=d.get("throttle_opens"),
            read_mb=d.get("throttle_read_mb"), lists=d.get("throttle_lists"),
            heads=d.get("throttle_heads")))
    return cells


def formula_params():
    p = json.load(open("tools/tier_r18/formula_check.json"))["models"]
    return p["B_eta_additive"], p["C_eta_max"]


def predict(c, model, compose):
    parts = 32
    waves = math.ceil(parts / SLOTS)
    get_term = GET_S * (c["opens"] / parts) * waves
    bw_term = (c["read_mb"] or 0) / BW_MBPS
    meta = 0.0
    if c["listy"]:
        # discovery LISTs pay list latency; per-open HEADs also pay it
        # but are ALREADY inside the open's charge? No: open latency
        # (GET) and the HEAD sleep are charged separately — heads pay
        # list_ms on top of the open's open_ms. Both lanes count.
        meta = LIST_S * (((c["lists"] or 0) + (c["heads"] or 0)) / parts) * waves * model["eta"]
    g = model["eta"] * get_term
    return model["floor_s"] + compose(g, bw_term) + meta


def main():
    cells = load_cells()
    if not cells:
        sys.exit(f"no cells under {OUT}")
    mb, mc = formula_params()
    print(f"{'cell':30s} {'md':>3} {'list':>4} {'paus':>4} {'recov':>6} "
          f"{'ingest':>7} {'opens':>6} {'lists':>6} {'heads':>6} "
          f"{'predB':>6} {'resB%':>6}")
    rows = []
    for c in cells:
        pb = predict(c, mb, lambda g, b: g + b)
        pc = predict(c, mc, lambda g, b: max(g, b))
        rb = 100 * (pb - c["recovery_s"]) / c["recovery_s"] if c["recovery_s"] else None
        rows.append(dict(c, pred_B=round(pb, 2), resid_B_pct=round(rb, 1) if rb is not None else None,
                         pred_C=round(pc, 2)))
        print(f"{c['name']:30s} {c['md']:>3} {str(c['listy'])[0]:>4} "
              f"{str(c['paused'])[0]:>4} {c['recovery_s']:>6.1f} "
              f"{c['ingest_wall_s']:>7.1f} {c['opens'] or 0:>6} {c['lists'] or 0:>6} "
              f"{c['heads'] or 0:>6} {pb:>6.1f} {rb:>6.1f}")

    def mean(xs):
        xs = [x for x in xs if x is not None]
        return round(sum(xs) / len(xs), 2) if xs else None

    def sel(md, listy, paused):
        return [c for c in rows if c["md"] == md and c["listy"] == listy
                and c["paused"] == paused]

    race = {}
    for listy in (False, True):
        up = mean([c["recovery_s"] for c in sel(2, listy, False)])
        p = mean([c["recovery_s"] for c in sel(2, listy, True)])
        if up is not None and p is not None:
            race[("list" if listy else "base")] = dict(
                unpaused_s=up, paused_s=p, race_term_s=round(up - p, 2))
    summary = dict(race_term_md2=race,
                   md2_paused_resid_B_pct=[c["resid_B_pct"] for c in rows
                                           if c["md"] == 2 and c["paused"]],
                   md39_anchors={c["name"]: c["recovery_s"] for c in rows if c["md"] == 39})
    print(json.dumps(summary, indent=2))
    with open(os.path.join(OUT, "race_floor.json"), "w") as fh:
        json.dump(dict(params=dict(get_s=GET_S, bw_mbps=BW_MBPS, list_s=LIST_S),
                       summary=summary, cells=rows), fh, indent=1)
    print(f"wrote {OUT}/race_floor.json")


if __name__ == "__main__":
    main()
