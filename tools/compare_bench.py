#!/usr/bin/env python3
"""Compare two Bench JSON lines: per-query and per-family wall ratios.

Usage: python3 tools/compare_bench.py <base.json> <scaled.json> [--families]

Prints queries sorted by ratio (scaled/base), flagging ratios above the
data growth factor (super-linear suspects). Queries whose inputs did not
grow between the two runs are still listed — interpret with the growth
factor of the tables each query reads.
"""
import sys, json

def load(path):
    with open(path) as f:
        line = f.read().strip().splitlines()[-1]
    j = json.loads(line[line.index('{'):])
    return j["queries"]

def family(name):
    for p in ("q0", "q1", "q2"):
        if name.startswith(p):
            return "relational"
    return name.split("_")[0]

def main():
    base, scaled = load(sys.argv[1]), load(sys.argv[2])
    # a query missing from one side FAILED there (Bench excludes failed
    # queries from the map) — the strongest scaling signal; never drop
    # it silently
    for q in sorted(set(base) - set(scaled)):
        print(f"MISSING in scaled run (failed or removed): {q}")
    for q in sorted(set(scaled) - set(base)):
        print(f"MISSING in base run (failed or new): {q}")
    common = sorted(set(base) & set(scaled))
    rows = [(scaled[q] / base[q], base[q], scaled[q], q) for q in common
            if base[q] > 0]
    if not rows:
        print("no comparable queries between the two runs")
        return
    rows.sort(reverse=True)
    print(f"{'ratio':>7} {'base_s':>8} {'scaled_s':>9}  query")
    for r, b, s, q in rows:
        print(f"{r:7.2f} {b:8.2f} {s:9.2f}  {q}")
    fams = {}
    for r, b, s, q in rows:
        f = family(q)
        fams.setdefault(f, [0.0, 0.0])
        fams[f][0] += b
        fams[f][1] += s
    print(f"\n{'ratio':>7} {'base_s':>8} {'scaled_s':>9}  family")
    for f, (b, s) in sorted(fams.items(), key=lambda kv: -kv[1][1] / kv[1][0]):
        print(f"{s/b:7.2f} {b:8.2f} {s:9.2f}  {f}")
    tb, ts = sum(r[1] for r in rows), sum(r[2] for r in rows)
    print(f"\ntotal: {tb:.1f}s -> {ts:.1f}s ({ts/tb:.2f}x) over "
          f"{len(common)} shared queries")

if __name__ == "__main__":
    main()
