#!/bin/bash
# Third wave: runs after bench_r4_followup.sh completes — kernel probes
# for the scatter wall and the new scatter_sorted kernel.
cd /root/repo
OUT=bench_r4_auto.jsonl
for i in $(seq 1 600); do
  grep -q "FOLLOWUP DONE" $OUT 2>/dev/null && break
  sleep 60
done
run() {
  echo "# $1 start $(date -u +%H:%M:%S)" >> $OUT
  timeout 3000 bash -c "$2" >> $OUT 2>&1
  echo "# $1 exit=$? $(date -u +%H:%M:%S)" >> $OUT
}
run probe_scatter "python scripts/probe_scatter_r4.py"
run value_ab_fixed "python scripts/value_ab_r3.py"
run tc_fixed "BENCH_ONLY=tc python bench_all.py"
run sharded1_fixed "python scripts/bench_sharded1.py"
run deep_nodeeploop "GUNROCK_BFS_DEEP=0 GUNROCK_SSSP_DEEP=0 BENCH_ONLY=deep python bench_all.py"
run matrix_rest "bash scripts/bench_matrix.sh /root/repo/BENCH_MATRIX.jsonl"
echo "# FOLLOWUP2 DONE $(date -u +%H:%M:%S)" >> $OUT
