"""Compare the sf1 bench artifact against the committed sf0.1 one and
flag superlinear scalers (VERDICT r7 #7).

With 10× rows on the same 32 cores, a perfectly linear query costs ≤10×
its sf0.1 wall time once per-query fixed overhead (session, planning,
Python-worker spin-up — ~0.3-0.5 s here) is discounted.  We flag a query
when sf1 > SLOPE_FLAG × max(sf0.1 − FIXED, FLOOR) — i.e. the marginal
cost grew faster than SLOPE_FLAG despite generous overhead discounting —
and print the table sorted by that ratio for SCALE.md.
"""

from __future__ import annotations

import json
import sys

SF01 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/BENCH_LOCAL.json"
SF1 = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/BENCH_SF1.json"
FIXED = 0.35  # per-query fixed overhead discount, sec
FLOOR = 0.05  # avoid dividing by ~zero marginal cost
SLOPE_FLAG = 15.0  # 10x data; >15x marginal = superlinear with margin
# A ratio alone cannot convict a cheap query: at these corpus sizes a
# sub-5s sf1 wall is dominated by scheduling/codegen jitter, and warm
# sf0.1 sampling (r13) shrank many denominators to ~0.2-0.4s, inflating
# ratios ~10x for free.  A true quadratic at sf1 clears 5s absolute
# (every one we caught did: 280.6s, 47.3s, 26s...), so the flag requires
# BOTH the slope and the absolute cost.
ABS_MIN = 5.0  # sec at sf1; below this a high ratio is noise, not shape


def main() -> None:
    a = json.load(open(SF01))["queries"]
    b = json.load(open(SF1))["queries"]
    rows = []
    for name, t1 in b.items():
        t0 = a.get(name)
        if t0 is None:
            continue
        marginal0 = max(t0 - FIXED, FLOOR)
        marginal1 = max(t1 - FIXED, FLOOR)
        rows.append((marginal1 / marginal0, t0, t1, name))
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] > SLOPE_FLAG and r[2] >= ABS_MIN]
    print(f"{len(rows)} common queries; {len(flagged)} flagged > {SLOPE_FLAG}x marginal")
    print(f"{'ratio':>7} {'sf0.1':>8} {'sf1':>8}  query")
    for ratio, t0, t1, name in rows[:25]:
        mark = " <== SUPERLINEAR" if ratio > SLOPE_FLAG and t1 >= ABS_MIN else ""
        print(f"{ratio:7.1f} {t0:8.2f} {t1:8.2f}  {name}{mark}")
    med = sorted(r[0] for r in rows)[len(rows) // 2]
    print(f"median marginal ratio: {med:.1f}x (10x data)")


if __name__ == "__main__":
    main()
