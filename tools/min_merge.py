#!/usr/bin/env python3
"""Per-query MIN-merge of two OR MORE bench_compare passes, applied to
BOTH engines symmetrically (the BENCHNOTES r7 protocol for a bursty
host; variadic since r15 so an automatic third pass can self-heal an
environmental burst instead of needing a manual supplementary run).

  python3 tools/min_merge.py cmp_a.md cmp_b.md [cmp_c.md ...] > merged.md

Parses the markdown tables, takes min(spark), min(duckdb) per query
(a capped ">Ns" row stays capped only if capped in EVERY pass that has
the query; a "—" no-oracle row stays "—"), and re-emits the table +
totals.
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

def main(paths):
    if len(paths) < 2:
        sys.exit("usage: min_merge.py cmp_a.md cmp_b.md [cmp_c.md ...] "
                 "(min-merge needs at least two passes)")
    passes = [parse(p) for p in paths]
    qs = []
    for p in passes:
        for q in p:
            if q not in qs:
                qs.append(q)
    lines = ["| query | spark s | duckdb s | spark/duckdb |", "|---|---|---|---|"]
    tot_s = tot_d = 0.0
    for q in qs:
        entries = [p[q] for p in passes if q in p]
        s = min(e[0] for e in entries)
        ds = [e[1] for e in entries]
        if any(d is None for d in ds):
            lines.append(f"| {q} | {s:.2f} | — | — |")
            continue
        capped = all(e[2] for e in entries)
        # all passes capped: the TIGHTEST lower bound is the MAX cap
        # (the engine exceeded every one of them), not pass A's
        d = min(ds) if not capped else max(ds)
        if capped:
            lines.append(f"| {q} | {s:.2f} | >{d:.0f} (capped) | <{s/d:.3f}x |")
        else:
            tot_s += s; tot_d += d
            ratio = f"{s/d:.1f}x" if d > 0 else "inf"
            lines.append(f"| {q} | {s:.2f} | {d:.2f} | {ratio} |")
    ratio = f"{tot_s/tot_d:.2f}x" if tot_d > 0 else "—"
    lines.append(f"| **total (oracle-comparable)** | **{tot_s:.2f}** | "
                 f"**{tot_d:.2f}** | **{ratio}** |")
    print("\n".join(lines))

if __name__ == '__main__':
    main(sys.argv[1:])
