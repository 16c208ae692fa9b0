#!/usr/bin/env python3
"""Scaling linearity check between two Bench JSONs at different SFs.

  python3 tools/scale_check.py bench_sf1.json bench_sf10.json 10

Prints per-query t2/t1 ratios sorted descending with the nominal scale
factor ratio as the linear reference. A ratio well ABOVE the data ratio
flags a super-linear operator (the thing to fix before 100 TB); well
below means fixed overhead still dominates at the smaller scale.
"""
import sys, json

def main(a_path, b_path, nominal):
    def load(p):
        q = json.load(open(p))["queries"]
        return {k: float(v) for k, v in q.items()
                if isinstance(v, (int, float))}
    a, b = load(a_path), load(b_path)
    nominal = float(nominal)
    rows = sorted(((q, a[q], b[q], b[q] / a[q]) for q in a if q in b),
                  key=lambda r: -r[3])
    print(f"| query | t1 s | t2 s | t2/t1 (linear={nominal:.0f}x) |")
    print("|---|---|---|---|")
    for q, t1, t2, r in rows:
        flag = " ⚠" if r > nominal * 1.5 and t2 > 2.0 else ""
        print(f"| {q} | {t1:.2f} | {t2:.2f} | {r:.1f}x{flag} |")
    ta, tb = sum(a[q] for q, *_ in rows), sum(b[q] for q, *_ in rows)
    print(f"| **total** | **{ta:.2f}** | **{tb:.2f}** | **{tb/ta:.1f}x** |")

if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2], sys.argv[3])
