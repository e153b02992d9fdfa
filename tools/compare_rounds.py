#!/usr/bin/env python3
"""Cross-run-minima comparison between two rounds' bench ledgers.

Usage: compare_rounds.py "<glob_prev>" "<glob_now>" [--prepare]

Each ledger is a full Bench JSON (one run). For every query present in
BOTH rounds' ledger sets, the per-query minimum across each round's
runs is compared; prepare-phase metrics (the *_build top-level keys)
are compared the same way with --prepare. Prints per-family ratios,
total-of-minima, geomean/median, and the worst regressions.
"""
import glob
import json
import math
import sys


def mins(paths):
    per = {}
    prep = {}
    for p in paths:
        d = json.load(open(p))
        if "queries" not in d:
            continue
        for k, v in d["queries"].items():
            if isinstance(v, (int, float)) and not math.isnan(v):
                per[k] = min(per.get(k, 1e18), v)
        for k, v in d.items():
            if k.endswith("_build") and isinstance(v, (int, float)):
                prep[k] = min(prep.get(k, 1e18), v)
    return per, prep


def family(q):
    for pfx, name in [("q2", "relational"), ("q0", "relational"),
                      ("q1", "relational"), ("cdc_", "cdc"),
                      ("sessionize", "cdc"), ("asof_", "temporal"),
                      ("range_join", "cdc"), ("dedup_", "dedup"),
                      ("ann_", "ann"), ("sim_", "sim"), ("text_", "text"),
                      ("curate_", "curation"), ("mm_", "multimodal"),
                      ("retrieval", "retrieval"), ("prune", "prune")]:
        if q.startswith(pfx):
            return name
    return "other"


def main():
    prev_glob, now_glob = sys.argv[1], sys.argv[2]
    prev, prevp = mins(sorted(glob.glob(prev_glob)))
    now, nowp = mins(sorted(glob.glob(now_glob)))
    common = sorted(set(prev) & set(now))
    print(f"runs: prev={len(glob.glob(prev_glob))} now={len(glob.glob(now_glob))}; "
          f"common queries={len(common)} "
          f"(prev-only={sorted(set(prev)-set(now))}, now-only={sorted(set(now)-set(prev))})")
    tp = sum(prev[q] for q in common)
    tn = sum(now[q] for q in common)
    ratios = sorted((now[q] / prev[q], q) for q in common)
    geo = math.exp(sum(math.log(r) for r, _ in ratios) / len(ratios))
    med = ratios[len(ratios) // 2][0]
    print(f"total-of-minima: {tp:.1f} -> {tn:.1f}  ratio {tn/tp:.3f}")
    print(f"per-query geomean {geo:.3f}  median {med:.3f}")
    fams = {}
    for q in common:
        fams.setdefault(family(q), [0.0, 0.0])
        fams[family(q)][0] += prev[q]
        fams[family(q)][1] += now[q]
    print("family totals (min sums):")
    for f, (a, b) in sorted(fams.items()):
        print(f"  {f:12s} {a:8.1f} -> {b:8.1f}  {b/a:.3f}")
    print("worst 8:")
    for r, q in ratios[::-1][:8]:
        print(f"  {q:36s} {prev[q]:7.2f} -> {now[q]:7.2f}  {r:.2f}x")
    print("best 8:")
    for r, q in ratios[:8]:
        print(f"  {q:36s} {prev[q]:7.2f} -> {now[q]:7.2f}  {r:.2f}x")
    if "--prepare" in sys.argv:
        print("prepare metrics (min):")
        for k in sorted(set(prevp) & set(nowp)):
            r = f"{nowp[k]/prevp[k]:.2f}x" if prevp[k] > 0 else "n/a"
            print(f"  {k:32s} {prevp[k]:7.2f} -> {nowp[k]:7.2f}  {r}")


if __name__ == "__main__":
    main()
