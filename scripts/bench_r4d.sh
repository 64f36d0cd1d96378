#!/bin/bash
# Round-4 wave D (live tree): after wave C — re-measure TC with the
# dynamic-num_edges fix (one compile for all chunks) and the deep-regime
# A/B rows that decide GUNROCK_BFS_DEEP/GUNROCK_SSSP_DEEP defaults.
cd /root/repo
OUT=bench_r4_auto.jsonl
for i in $(seq 1 600); do
  grep -q "WAVEC DONE" $OUT 2>/dev/null && break
  sleep 60
done
run() {
  echo "# $1 start $(date -u +%H:%M:%S)" >> $OUT
  timeout ${3:-3000} bash -c "$2" >> $OUT 2>&1
  echo "# $1 exit=$? $(date -u +%H:%M:%S)" >> $OUT
}
run tc_fixed "BENCH_ONLY=tc python bench_all.py"
run deep_off "GUNROCK_BFS_DEEP=0 GUNROCK_SSSP_DEEP=0 BENCH_ONLY=deep python bench_all.py"
run deep_carry_profile "python scripts/profile_deep_r3.py"
echo "# WAVED DONE $(date -u +%H:%M:%S)" >> $OUT
