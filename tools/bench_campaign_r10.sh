#!/bin/bash
# r10 protocol bench campaign: two gated passes per scale, min-merged.
# sf0.1: DuckDB min-of-2 per pass (r7 protocol). sf1: DuckDB single
# run, 600 s cap. sf10: DuckDB single run, 300 s cap (stated in
# BENCHNOTES; the oracle engine's quadratic rows would otherwise
# dominate the campaign).
set -x
cd /root/repo
export SPARK_GRAFT_LOAD_WAIT_S=900

run_bench () { # sfdir out iters
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_BENCH_OUT=$2 SPARK_GRAFT_BENCH_ITERS=$3 \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -2
}

# ---- sf0.1 ----
run_bench /root/testdata/sf0.1 /tmp/r10_bench_sf01_a.json 3
RUNS=2 python3 tools/bench_compare.py /root/testdata/sf0.1 /tmp/r10_bench_sf01_a.json /tmp/r10_cmp_sf01_a.md /tmp/verify_r10b/oracle_sql.json
run_bench /root/testdata/sf0.1 /tmp/r10_bench_sf01_b.json 3
RUNS=2 python3 tools/bench_compare.py /root/testdata/sf0.1 /tmp/r10_bench_sf01_b.json /tmp/r10_cmp_sf01_b.md /tmp/verify_r10b/oracle_sql.json
python3 tools/min_merge.py /tmp/r10_cmp_sf01_a.md /tmp/r10_cmp_sf01_b.md > /tmp/r10_merged_sf01.md

# ---- sf1 ----
run_bench /tmp/testdata/sf1 /tmp/r10_bench_sf1_a.json 3
run_bench /tmp/testdata/sf1 /tmp/r10_bench_sf1_b.json 3
RUNS=1 TIMEOUT=600 python3 tools/bench_compare.py /tmp/testdata/sf1 /tmp/r10_bench_sf1_a.json /tmp/r10_cmp_sf1_a.md /tmp/verify_r10b/oracle_sql.json

# ---- sf10 ----
run_bench /tmp/testdata/sf10 /tmp/r10_bench_sf10_a.json 2
run_bench /tmp/testdata/sf10 /tmp/r10_bench_sf10_b.json 2
RUNS=1 TIMEOUT=300 python3 tools/bench_compare.py /tmp/testdata/sf10 /tmp/r10_bench_sf10_a.json /tmp/r10_cmp_sf10_a.md /tmp/verify_r10b/oracle_sql.json

python3 tools/scale_check.py /tmp/r10_bench_sf1_a.json /tmp/r10_bench_sf10_a.json 10 > /tmp/r10_scale_sf1_sf10.md
echo CAMPAIGN_DONE
