#!/usr/bin/env python3
"""Job-floor-netted totals for a merged bench table (r16, verdict #4):
recompute the oracle-comparable totals EXCLUDING rows whose DuckDB
denominator is under a floor (default 50 ms) — those ratios measure
per-query job-submission overhead against a near-zero denominator and
swing the headline on co-tenant noise, not engine work. Prints one
markdown line to append below min_merge.py's totals row.

  python3 tools/net_ratio.py merged.md [floor_s]
"""
import sys, re

def main(path, floor=0.05):
    tot_s = tot_d = 0.0
    dropped = []
    for line in open(path):
        m = re.match(r'\|\s*(q\w+)\s*\|\s*([\d.]+)\s*\|\s*([\d.]+)\s*\|', line)
        if not m:
            continue
        q, s, d = m.group(1), float(m.group(2)), float(m.group(3))
        if d < floor:
            dropped.append(q)
            continue
        tot_s += s
        tot_d += d
    ratio = f"{tot_s/tot_d:.2f}x" if tot_d > 0 else "—"
    print(f"| **total (job-floor-netted, oracle ≥ {int(floor*1000)} ms; "
          f"{len(dropped)} rows excluded)** | **{tot_s:.2f}** | "
          f"**{tot_d:.2f}** | **{ratio}** |")

if __name__ == '__main__':
    main(sys.argv[1], float(sys.argv[2]) if len(sys.argv) > 2 else 0.05)
