#!/bin/bash
# r11 protocol bench campaign, SECOND edition — run at the round's
# final HEAD (the first campaign ran at bff9210, before the media
# decode / top-k / kernel-barrier fixes landed). Protocol: two gated
# passes per scale, per-query min applied to BOTH engines
# symmetrically (BENCHNOTES r7). sf10 pass A is the probe pass
# already on disk (/tmp/r11_probe_sf10.json) when present.
# DuckDB: min-of-2 at sf0.1; single run, 600 s/query cap at sf1;
# 300 s cap at sf10.
set -x
cd /root/repo
export SPARK_GRAFT_LOAD_WAIT_S=900
ORACLE=/tmp/vout_r11/oracle_sql.json

run_bench () { # sfdir out iters
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_BENCH_OUT=$2 SPARK_GRAFT_BENCH_ITERS=$3 \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -2
}

spark_min () { # cmp_in.md bench_b.json cmp_out.md
  python3 - "$1" "$2" "$3" <<'EOF'
import sys, re, json
cmp_in, bench_b, out = sys.argv[1:4]
qb = json.load(open(bench_b))["queries"]
lines = []
for line in open(cmp_in):
    m = re.match(r'(\|\s*)(q\w+)(\s*\|\s*)([\d.]+)(\s*\|.*)', line)
    if m and m.group(2) in qb:
        s = min(float(m.group(4)), qb[m.group(2)])
        line = f"{m.group(1)}{m.group(2)}{m.group(3)}{s:.2f}{m.group(5)}\n"
    lines.append(line)
open(out, 'w').writelines(lines)
EOF
}

# ---- sf10 ----
if [ ! -f /tmp/r11_probe_sf10.json ]; then
  run_bench /tmp/testdata/sf10 /tmp/r11_probe_sf10.json 2
fi
run_bench /tmp/testdata/sf10 /tmp/r11b_bench_sf10_b.json 2
RUNS=1 TIMEOUT=300 python3 tools/bench_compare.py /tmp/testdata/sf10 /tmp/r11_probe_sf10.json /tmp/r11b_cmp_sf10_a.md $ORACLE
spark_min /tmp/r11b_cmp_sf10_a.md /tmp/r11b_bench_sf10_b.json /tmp/r11b_merged_sf10.md

# ---- sf1 ----
run_bench /tmp/testdata/sf1 /tmp/r11b_bench_sf1_a.json 3
run_bench /tmp/testdata/sf1 /tmp/r11b_bench_sf1_b.json 3
RUNS=1 TIMEOUT=600 python3 tools/bench_compare.py /tmp/testdata/sf1 /tmp/r11b_bench_sf1_a.json /tmp/r11b_cmp_sf1_a.md $ORACLE
spark_min /tmp/r11b_cmp_sf1_a.md /tmp/r11b_bench_sf1_b.json /tmp/r11b_merged_sf1.md

# ---- sf0.1 ----
run_bench /root/testdata/sf0.1 /tmp/r11b_bench_sf01_a.json 3
RUNS=2 python3 tools/bench_compare.py /root/testdata/sf0.1 /tmp/r11b_bench_sf01_a.json /tmp/r11b_cmp_sf01_a.md $ORACLE
run_bench /root/testdata/sf0.1 /tmp/r11b_bench_sf01_b.json 3
RUNS=2 python3 tools/bench_compare.py /root/testdata/sf0.1 /tmp/r11b_bench_sf01_b.json /tmp/r11b_cmp_sf01_b.md $ORACLE
python3 tools/min_merge.py /tmp/r11b_cmp_sf01_a.md /tmp/r11b_cmp_sf01_b.md > /tmp/r11b_merged_sf01.md

python3 tools/scale_check.py /tmp/r11b_bench_sf1_a.json /tmp/r11_probe_sf10.json 10 > /tmp/r11b_scale_sf1_sf10.md
echo CAMPAIGN_DONE
