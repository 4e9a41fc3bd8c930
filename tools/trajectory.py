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

Trust column (round 19, VERDICT r18 task 1): each row carries the
io-band verdict from tools/io_band.json — `trust` (normalize freely),
`minima-only` (totals are stall-inflated; per-query minima survive),
`interleave` (window too taxed to normalize; adjudicate only by a
same-boot interleaved A/B), or `n/a` (pre-io-probe round). The band
never convicts a binary: a >=10% normalized rise STILL requires the
A/B (SCALING.md r18 follow-up 2) — the band only says whether the
normalized number is worth reading at all.

Usage: python3 tools/trajectory.py [repo_dir]
"""
import glob
import json
import os
import re
import sys

REF_C1, REF_CN = 0.104, 0.225  # pre-reboot host reference pair

# io-band defaults; tools/io_band.json overrides when present
IO_TRUST, CB_TRUST, IO_MINIMA = 0.22, 10.0, 0.30


def load_band(repo):
    p = os.path.join(repo, "tools", "io_band.json")
    if not os.path.exists(p):
        return IO_TRUST, CB_TRUST, IO_MINIMA
    t = json.load(open(p)).get("thresholds", {})
    return (t.get("io_trust_s", IO_TRUST), t.get("copy_build_trust_s", CB_TRUST),
            t.get("io_minima_only_s", IO_MINIMA))


def trust_verdict(io, copy_build, io_trust, cb_trust, io_minima):
    """The io-band rule. io None = pre-probe round; io < 0 = probe failed."""
    if io is None:
        # pre-probe rounds: copy_build alone can still flag a disaster
        if copy_build is not None and copy_build > 15.0:
            return "interleave"
        return "n/a"
    if io < 0:
        return "interleave"
    if io <= io_trust and (copy_build is None or copy_build <= cb_trust):
        return "trust"
    if io <= io_minima and (copy_build is None or copy_build <= 15.0):
        return "minima-only"
    return "interleave"

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
    io_trust, cb_trust, io_minima = load_band(repo)
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
        io = calib.get("io")
        cb = p.get("copy_build_secs")
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
            "io": io,
            "copy_build_s": cb,
            "trust": trust_verdict(io, cb, io_trust, cb_trust, io_minima),
        })
    return out


def markdown(table):
    lines = [
        "| round | queries | raw total (s) | calib1 | calibN | host factor | normalized total (s) | io (s) | copy_build (s) | trust |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in table:
        if "note" in r:
            lines.append(f"| r{r['round']:02d} | — | ({r['note']}) | | | | | | | |")
            continue
        star = "*" if r["retro"] else ""
        io = f"{r['io']:.3f}" if r.get("io") is not None else "—"
        cb = f"{r['copy_build_s']:.1f}" if r.get("copy_build_s") is not None else "—"
        lines.append(
            f"| r{r['round']:02d} | {r['queries']} | {r['raw_total_s']:.1f} "
            f"| {r['calib1']:.3f}{star} | {r['calibN']:.3f}{star} "
            f"| {r['host_factor']:.2f} | {r['normalized_total_s']:.1f} "
            f"| {io} | {cb} | {r['trust']} |")
    lines.append("")
    lines.append("`*` = retro-attributed (CPU probe added in r11; "
                 "reference pair seeded per SCALING.md r11 follow-up 9). "
                 "`queries` = the round's CORRECTNESS registry size "
                 "(falls back to the bench's per-query map where no "
                 "registry artifact exists). `trust` = the io-band rule "
                 "(tools/io_band.json): whether this row's NORMALIZED "
                 "total is readable — `minima-only` rows carry single-rep "
                 "IO stalls (read per-query minima, not the total); "
                 "`interleave` rows can only be adjudicated by a "
                 "same-boot interleaved A/B; binaries are never convicted "
                 "by this table alone.")
    return "\n".join(lines)


if __name__ == "__main__":
    repo = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    table = rows(repo)
    print(markdown(table))
    print()
    print(json.dumps(table))
