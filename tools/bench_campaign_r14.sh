#!/bin/bash
# r14 protocol (same as r12) bench campaign — the SYMMETRIC edition (r11 verdict
# task #4): TWO gated passes per scale on BOTH engines at ALL three
# scales, per-query MIN applied symmetrically by tools/min_merge.py.
# (r11 ran the DuckDB side once at sf1/sf10; r14 pairs each Spark pass
# with its own fresh DuckDB pass and min-merges the two compare
# tables, so both engines get min-of-2 everywhere.)
# DuckDB caps: none at sf0.1 (RUNS=2 inside each pass), 600 s/query at
# sf1, 300 s/query at sf10 — a capped row reports ">Ns" and the
# aggregate excludes that query from BOTH engines.
set -x
cd /root/repo
export SPARK_GRAFT_LOAD_WAIT_S=900
ORACLE=/tmp/vout/oracle_sql.json

run_bench () { # sfdir out iters
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_BENCH_OUT=$2 SPARK_GRAFT_BENCH_ITERS=$3 \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -2
}

# ---- sf0.1 ----
run_bench /root/testdata/sf0.1 /tmp/r14_bench_sf01_a.json 3
RUNS=2 python3 tools/bench_compare.py /root/testdata/sf0.1 /tmp/r14_bench_sf01_a.json /tmp/r14_cmp_sf01_a.md $ORACLE
run_bench /root/testdata/sf0.1 /tmp/r14_bench_sf01_b.json 3
RUNS=2 python3 tools/bench_compare.py /root/testdata/sf0.1 /tmp/r14_bench_sf01_b.json /tmp/r14_cmp_sf01_b.md $ORACLE
python3 tools/min_merge.py /tmp/r14_cmp_sf01_a.md /tmp/r14_cmp_sf01_b.md > /tmp/r14_merged_sf01.md

# ---- sf1 ----
run_bench /tmp/testdata/sf1 /tmp/r14_bench_sf1_a.json 3
RUNS=1 TIMEOUT=600 python3 tools/bench_compare.py /tmp/testdata/sf1 /tmp/r14_bench_sf1_a.json /tmp/r14_cmp_sf1_a.md $ORACLE
run_bench /tmp/testdata/sf1 /tmp/r14_bench_sf1_b.json 3
RUNS=1 TIMEOUT=600 python3 tools/bench_compare.py /tmp/testdata/sf1 /tmp/r14_bench_sf1_b.json /tmp/r14_cmp_sf1_b.md $ORACLE
python3 tools/min_merge.py /tmp/r14_cmp_sf1_a.md /tmp/r14_cmp_sf1_b.md > /tmp/r14_merged_sf1.md

# ---- sf10 ----
run_bench /tmp/testdata/sf10 /tmp/r14_bench_sf10_a.json 2
RUNS=1 TIMEOUT=300 python3 tools/bench_compare.py /tmp/testdata/sf10 /tmp/r14_bench_sf10_a.json /tmp/r14_cmp_sf10_a.md $ORACLE
run_bench /tmp/testdata/sf10 /tmp/r14_bench_sf10_b.json 2
RUNS=1 TIMEOUT=300 python3 tools/bench_compare.py /tmp/testdata/sf10 /tmp/r14_bench_sf10_b.json /tmp/r14_cmp_sf10_b.md $ORACLE
python3 tools/min_merge.py /tmp/r14_cmp_sf10_a.md /tmp/r14_cmp_sf10_b.md > /tmp/r14_merged_sf10.md

python3 tools/scale_check.py /tmp/r14_bench_sf1_a.json /tmp/r14_bench_sf10_a.json 10 > /tmp/r14_scale_sf1_sf10.md
echo CAMPAIGN_DONE
