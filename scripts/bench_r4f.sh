#!/bin/bash
# Round-4 wave F: after wave E — deep micro-rung ladder A/B.
cd /root/repo
OUT=bench_r4_auto.jsonl
for i in $(seq 1 600); do
  grep -q "WAVEE DONE" $OUT 2>/dev/null && break
  sleep 60
done
run() {
  echo "# $1 start $(date -u +%H:%M:%S)" >> $OUT
  timeout ${3:-3000} bash -c "$2" >> $OUT 2>&1
  echo "# $1 exit=$? $(date -u +%H:%M:%S)" >> $OUT
}
run deep_rungs3 "GUNROCK_BFS_DEEP_RUNGS=512,2048,8192 GUNROCK_SSSP_DEEP_RUNGS=512,2048,8192 BENCH_ONLY=deep python bench_all.py"
run deep_rungs2 "GUNROCK_BFS_DEEP_RUNGS=2048,8192 GUNROCK_SSSP_DEEP_RUNGS=2048,8192 BENCH_ONLY=deep python bench_all.py"
echo "# WAVEF DONE $(date -u +%H:%M:%S)" >> $OUT
