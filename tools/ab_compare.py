#!/usr/bin/env python3
"""Compare cache-class A/B arms (tools/ab_cache_classes.sh output).

For each arm ab_no_<class>.json vs ab_baseline.json: per-query ratio of
per-rep MIN (baseline/excluded — >1 means the RESIDENT cache taxes that
query), split into the class's consumers (their min legitimately rises
when excluded) and everything else (the tax population). Reports the
non-consumer median/p90 ratio and the suite totals.

Usage: python3 tools/ab_compare.py <dir> [class ...]
"""
import json
import statistics
import sys

CONSUMERS = {
    "band": ["q18_minhash_sig", "q18_minhash_pairs", "q18_minhash_quality",
             "q18_cc_dedup", "q18_pagerank", "q18_dedup_report",
             "q18_cluster_split", "q18_dup_topology"],
    "simhash": ["q18_simhash", "q18_simhash_pairs", "q18_simhash_quality"],
    "modality": ["q18_image_dedup", "q18_image_features", "q18_video_dedup",
                 "q18_video_features", "q18_audio_dedup", "q18_audio_features",
                 "q18_multimodal"],
    "termfreq": ["q18_tfidf", "q18_tfidf_sim", "q18_bm25", "q18_repetition",
                 "q18_unigram_surprisal", "q18_bigram_lp"],
}


def mins(path):
    doc = json.load(open(path))
    return {q: min(v) for q, v in doc.get("raw", {}).items() if v}, doc


def main():
    d = sys.argv[1]
    classes = sys.argv[2:] or list(CONSUMERS)
    base, bdoc = mins(f"{d}/ab_baseline.json")
    try:
        base2, _ = mins(f"{d}/ab_baseline2.json")
        merged = {q: min(base[q], base2[q]) for q in base if q in base2}
        drift_pair = statistics.median(
            base2[q] / base[q] for q in base if q in base2 and base[q] > 0)
        print(f"baseline2/baseline median min ratio (bracket): {drift_pair:.3f}")
        base = merged
    except FileNotFoundError:
        pass
    for c in classes:
        exc, edoc = mins(f"{d}/ab_no_{c}.json")
        cons = set()
        for pref in CONSUMERS.get(c, []):
            cons.update(q for q in base if q.startswith(pref))
        ratios = {q: base[q] / exc[q] for q in base
                  if q in exc and exc[q] > 0 and base[q] > 0}
        non = sorted(v for q, v in ratios.items() if q not in cons)
        con = sorted((q, ratios[q]) for q in cons if q in ratios)
        if not non:
            print(f"{c}: no data")
            continue
        med = statistics.median(non)
        p90 = non[int(0.9 * (len(non) - 1))]
        taxed = sum(1 for v in non if v > 1.15)
        print(f"\n== class {c} ==")
        print(f"  non-consumers ({len(non)}): median base/excl min ratio "
              f"{med:.3f}  p90 {p90:.3f}  queries>1.15x: {taxed}")
        print(f"  consumer cost when excluded (excl/base, >1 = recompute price):")
        for q, v in con:
            print(f"    {q}: {1/v:.2f}x")
        bt = sum(v for v in base.values())
        et = sum(v for q, v in exc.items() if q in base)
        print(f"  suite min-total: baseline {bt:.1f}s vs no_{c} {et:.1f}s")
        verdict = ("TAX — migrate to materializedDerived" if med > 1.1
                   else "free at this SF — keep resident")
        print(f"  verdict: {verdict}")


if __name__ == "__main__":
    main()
