#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
Reads each <verifyOutDir>/<query>/ parquet (Spark result) and replays
<verifyOutDir>/oracle_sql.json in DuckDB against the sfDir parquet
tables; compares schema-insensitively: columns sorted by name, rows
sorted, values hashed.

Type-aware: the driver's hasher distinguishes physical widths that
Python repr() collapses (DuckDB SUM(BIGINT) -> HUGEINT/int128 vs
Spark's int64 — the r1-q03 / r2-q53 failure class), so we compare the
DuckDB-declared column types of both relations and fail on any
physical-type divergence, making local green as strong as driver green.
"""
import sys, os, json, glob
import duckdb

def canon(rows, ncols):
    def norm(v):
        if isinstance(v, float):
            return repr(v)
        return repr(v)
    return sorted(tuple(norm(v) for v in r) for r in rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in glob.glob(os.path.join(sf_dir, '*.parquet')):
        name = os.path.basename(t)[:-len('.parquet')]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")
    oracle = json.load(open(os.path.join(out_dir, 'oracle_sql.json')))
    results = {}
    for q in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, q)
        if not os.path.isdir(qdir):
            continue
        spark_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        spark_cols = sorted(spark_rel.columns)
        sel = ', '.join(f'"{c}"' for c in spark_cols)
        spark_sorted = con.sql(f"SELECT {sel} FROM spark_rel")
        spark_types = [str(t) for t in spark_sorted.types]
        spark_rows = spark_sorted.fetchall()
        if q not in oracle:
            results[q] = f"NO-ORACLE rows={len(spark_rows)}"
            continue
        try:
            ora_rel = con.sql(oracle[q])
            ora_cols = sorted(ora_rel.columns)
            con.register('ora_view', ora_rel)
            osel = ', '.join(f'"{c}"' for c in ora_cols)
            ora_sorted = con.sql(f"SELECT {osel} FROM ora_rel")
            ora_types = [str(t) for t in ora_sorted.types]
            ora_rows = ora_sorted.fetchall()
        except Exception as e:
            results[q] = f"ORACLE-ERROR {str(e)[:160]}"
            continue
        if spark_cols != ora_cols:
            results[q] = f"COLS-MISMATCH spark={spark_cols} oracle={ora_cols}"
            continue
        if spark_types != ora_types:
            bad = [(c, s, o) for c, s, o in zip(spark_cols, spark_types, ora_types) if s != o]
            results[q] = f"TYPES-MISMATCH {bad}"
            continue
        a, b = canon(spark_rows, len(spark_cols)), canon(ora_rows, len(ora_cols))
        if len(a) != len(b):
            results[q] = f"ROWCOUNT spark={len(a)} oracle={len(b)}"
        elif a != b:
            diff = next(i for i in range(len(a)) if a[i] != b[i])
            results[q] = f"VALUES-DIFFER at sorted row {diff}: spark={a[diff][:4]} oracle={b[diff][:4]}"
        else:
            results[q] = f"OK rows={len(a)}"
    width = max(len(q) for q in results)
    ok = sum(1 for v in results.values() if v.startswith('OK'))
    for q, v in sorted(results.items()):
        print(f"{q:<{width}}  {v}")
    print(f"== {ok}/{len(results)} OK")

if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])
