#!/usr/bin/env python3
"""Join two bench artifacts (small and large scale) and print per-query
wall-times plus the empirical scaling exponent:

    exponent = log(t_large / t_small) / log(scale_ratio)

1.0 = linear in data size, <1 = sublinear (fixed overheads amortizing),
>1 = super-linear (needs a named cause). Markdown table to stdout.

Usage: scale_exponents.py SMALL.json LARGE.json SCALE_RATIO
"""
import json
import math
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))
    large = json.load(open(sys.argv[2]))
    ratio = float(sys.argv[3])
    print("| query | t_small (s) | t_large (s) | t ratio | exponent |")
    print("|---|---|---|---|---|")
    rows = []
    for q, ts in sorted(small["queries"].items()):
        tl = large["queries"].get(q)
        if tl is None or ts <= 0:
            continue
        r = tl / ts
        exp = math.log(r) / math.log(ratio)
        rows.append((q, ts, tl, r, exp))
    for q, ts, tl, r, exp in sorted(rows, key=lambda x: -x[4]):
        print(f"| {q} | {ts:.2f} | {tl:.2f} | {r:.2f}x | {exp:.2f} |")
    for name, art in (("small", small), ("large", large)):
        print(f"\n{name}: n_failed={art['n_failed']} steal={art['steal_pct']}% "
              f"spread_median={art['spread_median']} contended={art['contended']}")


if __name__ == "__main__":
    main()
