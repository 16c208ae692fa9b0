#!/usr/bin/env python3
"""Per-query MIN-merge of two bench_compare passes, applied to BOTH
engines symmetrically (the BENCHNOTES r7 protocol for a bursty host).

  python3 tools/min_merge.py cmp_a.md cmp_b.md > merged_table.md

Parses the two markdown tables, takes min(spark), min(duckdb) per
query (a capped ">Ns" row stays capped only if capped in BOTH passes;
a "—" no-oracle row stays "—"), and re-emits the table + totals.
"""
import sys, re

def parse(path):
    rows = {}
    for line in open(path):
        m = re.match(r'\|\s*(q\w+)\s*\|\s*([\d.]+)\s*\|\s*(>?[\d.]+|—)[^|]*\|', line)
        if m:
            q, s, d = m.group(1), float(m.group(2)), m.group(3)
            if d == '—':
                dv = None; capped = False
            elif d.startswith('>'):
                dv = float(d[1:]); capped = True
            else:
                dv = float(d); capped = False
            rows[q] = (s, dv, capped)
    return rows

def main(a_path, b_path):
    a, b = parse(a_path), parse(b_path)
    qs = [q for q in a if q in b] + [q for q in b if q not in a]
    lines = ["| query | spark s | duckdb s | spark/duckdb |", "|---|---|---|---|"]
    tot_s = tot_d = 0.0
    for q in qs:
        (sa, da, ca) = a.get(q, b[q])
        (sb, db, cb) = b.get(q, a[q])
        s = min(sa, sb)
        if da is None or db is None:
            lines.append(f"| {q} | {s:.2f} | — | — |")
            continue
        capped = ca and cb
        d = min(da, db) if not capped else da
        if capped:
            lines.append(f"| {q} | {s:.2f} | >{d:.0f} (capped) | <{s/d:.3f}x |")
        else:
            tot_s += s; tot_d += d
            ratio = f"{s/d:.1f}x" if d > 0 else "inf"
            lines.append(f"| {q} | {s:.2f} | {d:.2f} | {ratio} |")
    lines.append(f"| **total (oracle-comparable)** | **{tot_s:.2f}** | "
                 f"**{tot_d:.2f}** | **{tot_s/tot_d:.2f}x** |")
    print("\n".join(lines))

if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])
