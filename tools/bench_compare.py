#!/usr/bin/env python3
"""Spark-vs-DuckDB per-query comparison.

The reference component delegates all execution to DuckDB, so DuckDB
running each oracle at the same scale factor is the closest thing to
"the reference's engine" on this hardware. Usage:

  python3 tools/bench_compare.py <sfDir> <bench_json> [out_md]

bench_json = the one-line JSON printed by graft.Bench at the same sfDir.
DuckDB timings are min-of-2 (same protocol as Bench); set RUNS=1 for
scale factors where the heavy oracles (all-pairs cosine, recursive
CTEs) make a second run cost more than the extra precision is worth.
"""
import sys, os, json, glob, time, threading
import duckdb

# Per-query wall-clock cap (seconds) on the DuckDB side; 0 = no cap.
# At sf1 a handful of oracles (all-pairs cosine, char-5-gram explode)
# run for upwards of an hour — a capped row reports ">TIMEOUTs" and
# the aggregate excludes it, which is the honest form of "the oracle
# engine did not finish in competitive time at this scale".
TIMEOUT = float(os.environ.get('TIMEOUT', '0'))

def main(sf_dir, bench_json_path, out_md=None):
    bench = json.loads(open(bench_json_path).read())
    spark_times = bench["queries"]
    con = duckdb.connect()
    con.sql(f"SET threads TO {os.cpu_count()}")
    for t in glob.glob(os.path.join(sf_dir, '*.parquet')):
        name = os.path.basename(t)[:-len('.parquet')]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")
    # oracle SQL comes from the Verify dump next to nothing — regenerate
    # by running Verify is heavy; instead accept an oracle_sql.json path
    oracle = json.load(open(sys.argv[4])) if len(sys.argv) > 4 else None
    if oracle is None:
        # default location written by graft.Verify
        oracle = json.load(open('/tmp/vout/oracle_sql.json'))
    rows = []
    for q in sorted(spark_times):
        st = spark_times[q]
        if q not in oracle:
            rows.append((q, st, None, None, False))
            continue
        times = []
        timed_out = False
        for _ in range(int(os.environ.get('RUNS', '2'))):
            t0 = time.time()
            timer = threading.Timer(TIMEOUT, con.interrupt) if TIMEOUT else None
            if timer:
                timer.start()
            try:
                con.sql(oracle[q]).fetchall()
                times.append(time.time() - t0)
            except Exception:
                timed_out = TIMEOUT and time.time() - t0 >= TIMEOUT
                times.append(None)
                break
            finally:
                if timer:
                    timer.cancel()
        dt = min([t for t in times if t is not None], default=None)
        rows.append((q, st, dt, (st / dt) if dt else None, timed_out))
    lines = ["| query | spark s | duckdb s | spark/duckdb |", "|---|---|---|---|"]
    tot_s = tot_d = 0.0
    for q, st, dt, ratio, timed_out in rows:
        if dt is not None:
            tot_s += st; tot_d += dt
            lines.append(f"| {q} | {st:.2f} | {dt:.2f} | {ratio:.1f}x |")
        elif timed_out:
            lines.append(f"| {q} | {st:.2f} | >{TIMEOUT:.0f} (capped) | <{st/TIMEOUT:.3f}x |")
        else:
            lines.append(f"| {q} | {st:.2f} | — | — |")
    lines.append(f"| **total (oracle-comparable)** | **{tot_s:.2f}** | **{tot_d:.2f}** | **{tot_s/tot_d:.1f}x** |")
    table = "\n".join(lines)
    print(table)
    if out_md:
        open(out_md, 'w').write(
            "# BENCHNOTES r1 — Spark (local[32]) vs DuckDB (same host) at sf0.1\n\n"
            "The reference delegates execution to DuckDB, so the DuckDB column is\n"
            "effectively the reference engine's single-node speed on this hardware.\n"
            "Spark numbers include its task-scheduling overhead, which amortizes on\n"
            "a cluster; DuckDB numbers are its native vectorized engine. Both\n"
            "min-of-2 runs.\n\n" + table + "\n")

if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
