#!/usr/bin/env python3
"""Calib-normalized cross-round bench trajectory from committed artifacts.

Emits a markdown table (round, queries, raw total, calib pair, host
factor, normalized total) from BENCH_r*.json, so cross-round comparisons
stop needing hand conversion across host generations (SCALING.md
"Round 12 table 1" is the hand-built ancestor of this output).

Normalization: the CPU probe (graft.Bench calibrate()) records
single-thread / 32-thread seconds per run; rounds before the probe
existed (< r11) are attributed to the pre-reboot host whose reference
pair 0.104/0.225 was retro-seeded in SCALING.md round-11 follow-up 9
and later confirmed by the probe to 0.4%. host factor =
max(calib1/0.104, calibN/0.225); normalized total = raw / factor —
i.e. every row is expressed in pre-reboot-host seconds.

Usage: python3 tools/trajectory.py [repo_dir]
"""
import glob
import json
import os
import re
import sys

REF_C1, REF_CN = 0.104, 0.225  # pre-reboot host reference pair

METRIC_RE = re.compile(r'\{"metric":"total".*\}')


def parsed_line(doc):
    """The bench JSON line: prefer the driver's `parsed` object, fall
    back to regex-extracting the metric line from the captured tail
    (early-round artifacts carry only the raw stdout tail)."""
    p = doc.get("parsed")
    if isinstance(p, dict) and p.get("value") is not None:
        return p
    m = METRIC_RE.search(doc.get("tail", "") or "")
    if m:
        try:
            return json.loads(m.group(0))
        except json.JSONDecodeError:
            return None
    return None


def rows(repo):
    out = []
    for f in sorted(glob.glob(os.path.join(repo, "BENCH_r*.json"))):
        rnd = int(re.search(r"BENCH_r(\d+)", f).group(1))
        doc = json.load(open(f))
        p = parsed_line(doc)
        if not p:
            out.append({"round": rnd, "note": "no bench line in artifact"})
            continue
        calib = p.get("calib") or {}
        c1, cn = calib.get("single"), calib.get("multi")
        retro = c1 is None
        if retro:  # pre-probe round: retro-attributed reference host
            c1, cn = REF_C1, REF_CN
        factor = max(c1 / REF_C1, cn / REF_CN)
        # surface size = the round's oracle registry (the bench's own
        # per-query map only lists the headline set on driver runs)
        nq = len(p.get("queries") or {})
        cf = os.path.join(repo, f"CORRECTNESS_r{rnd:02d}.json")
        if os.path.exists(cf):
            try:
                nq = len(json.load(open(cf)))
            except json.JSONDecodeError:
                pass
        errs = len(p.get("errors") or {})
        out.append({
            "round": rnd,
            "queries": nq,
            "errors": errs,
            "raw_total_s": p["value"],
            "calib1": c1,
            "calibN": cn,
            "retro": retro,
            "host_factor": round(factor, 3),
            "normalized_total_s": round(p["value"] / factor, 2),
        })
    return out


def markdown(table):
    lines = [
        "| round | queries | raw total (s) | calib1 | calibN | host factor | normalized total (s) |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in table:
        if "note" in r:
            lines.append(f"| r{r['round']:02d} | — | ({r['note']}) | | | | |")
            continue
        star = "*" if r["retro"] else ""
        lines.append(
            f"| r{r['round']:02d} | {r['queries']} | {r['raw_total_s']:.1f} "
            f"| {r['calib1']:.3f}{star} | {r['calibN']:.3f}{star} "
            f"| {r['host_factor']:.2f} | {r['normalized_total_s']:.1f} |")
    lines.append("")
    lines.append("`*` = retro-attributed (CPU probe added in r11; "
                 "reference pair seeded per SCALING.md r11 follow-up 9). "
                 "`queries` = the round's CORRECTNESS registry size "
                 "(falls back to the bench's per-query map where no "
                 "registry artifact exists).")
    return "\n".join(lines)


if __name__ == "__main__":
    repo = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    table = rows(repo)
    print(markdown(table))
    print()
    print(json.dumps(table))
