"""Compare two BENCH_DETAIL json files (same-host A/B), normalized by
their calibration probes.

Usage: python scripts/bench_compare.py BASE.json NEW.json [--md]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    base_p, new_p = sys.argv[1], sys.argv[2]
    md = "--md" in sys.argv
    a = json.load(open(base_p))
    b = json.load(open(new_p))
    qa, qb = a["queries"], b["queries"]
    print(f"base total {a['value']}  calib {a.get('calibration')}")
    print(f"new  total {b['value']}  calib {b.get('calibration')}")
    rows = []
    for k in sorted(qa):
        if k in qb:
            rows.append((qb[k] - qa[k], qa[k], qb[k], k))
    rows.sort()
    tot_a = sum(r[1] for r in rows)
    tot_b = sum(r[2] for r in rows)
    print(f"shared-query sums: {tot_a:.1f} -> {tot_b:.1f} ({tot_b/tot_a:.3f}x)")
    if md:
        print("| query | base s | new s | delta |")
        print("|---|---|---|---|")
    for d, x, y, k in rows:
        if abs(d) < 0.15 and not md:
            continue
        if md:
            print(f"| {k} | {x:.3f} | {y:.3f} | {d:+.3f} |")
        else:
            print(f"  {x:7.3f} -> {y:7.3f}  ({d:+.3f})  {k}")


if __name__ == "__main__":
    main()
