#!/bin/bash
# Round-4 wave C (live tree): runs after the snapshot suite completes.
# Measures the NEW fused v2 paths (filtered reduce + scatter_sorted),
# the deep micro-round op decomposition, and the SSSP pull-divisor
# sweep — the data that decides the GUNROCK_*_FUSED / *_DEEP defaults.
cd /root/repo
OUT=bench_r4_auto.jsonl
for i in $(seq 1 600); do
  grep -q "SUITE DONE" $OUT 2>/dev/null && break
  sleep 60
done
run() {
  echo "# $1 start $(date -u +%H:%M:%S)" >> $OUT
  timeout ${3:-3000} bash -c "$2" >> $OUT 2>&1
  echo "# $1 exit=$? $(date -u +%H:%M:%S)" >> $OUT
}
run fused_v2_ab "python scripts/fused_ab_r4.py"
run probe_deep "python scripts/probe_deep_r4.py"
run sssp_pulldiv64_fused "GUNROCK_SSSP_FUSED=1 GUNROCK_SSSP_PULL_DIV=64 BENCH_ONLY=sssp python bench_all.py"
run sssp_pulldiv4096_fused "GUNROCK_SSSP_FUSED=1 GUNROCK_SSSP_PULL_DIV=4096 BENCH_ONLY=sssp python bench_all.py"
run bc_fused_row "GUNROCK_BC_FUSED=1 BENCH_ONLY=bc python bench_all.py"
echo "# WAVEC DONE $(date -u +%H:%M:%S)" >> $OUT
