#!/bin/bash
# Runs after the snapshot suite completes: ICI calibration (VERDICT r3
# item 9), real-dataset matrix row, and the per-phase TPU profile —
# from the live tree.
cd /root/repo
OUT=bench_r4_auto.jsonl
for i in $(seq 1 600); do
  grep -q "SUITE DONE" $OUT 2>/dev/null && break
  sleep 60
done
run() {
  echo "# $1 start $(date -u +%H:%M:%S)" >> $OUT
  timeout 3000 bash -c "$2" >> $OUT 2>&1
  echo "# $1 exit=$? $(date -u +%H:%M:%S)" >> $OUT
}
run phase_profile "python scripts/profile_phases_r4.py"
run ici_calibrate "python scripts/ici_calibrate.py"
run market_row "BENCH_GRAPH=market: BENCH_ONLY=bfs,sssp,pr,cc,bc python bench_all.py"
echo "# FOLLOWUP DONE $(date -u +%H:%M:%S)" >> $OUT
