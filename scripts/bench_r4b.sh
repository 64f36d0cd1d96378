#!/bin/bash
# Round-4 re-measure (session 2): the previous session's raw artifacts were
# lost in a machine reset, so this chains all three waves sequentially from
# the frozen .benchsnap clone. Appends to /root/repo/bench_r4_auto.jsonl.
cd /root/repo/.benchsnap || exit 1
OUT=/root/repo/bench_r4_auto.jsonl
for i in $(seq 1 600); do
  if timeout 90 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    echo "# TPU up at $(date -u +%H:%M:%S)" >> $OUT
    break
  fi
  sleep 60
done
timeout 90 python -c "import jax; assert jax.devices()" 2>/dev/null || exit 1
run() {
  echo "# $1 start $(date -u +%H:%M:%S)" >> $OUT
  timeout ${3:-3000} bash -c "$2" >> $OUT 2>&1
  echo "# $1 exit=$? $(date -u +%H:%M:%S)" >> $OUT
}
# wave 1: headline rows
run flagship "python bench.py"
run table    "python bench_all.py"
run deep     "BENCH_ONLY=deep python bench_all.py"
run tc       "BENCH_ONLY=tc python bench_all.py"
# wave 2: probes + A/Bs that decide flag defaults
run probe_scatter "python scripts/probe_scatter_r4.py"
run fused_ab "python scripts/fused_ab_r4.py"
run value_ab "python scripts/value_ab_r3.py"
run profile  "python scripts/profile_deep_r3.py"
run deep_nodeeploop "GUNROCK_BFS_DEEP=0 GUNROCK_SSSP_DEEP=0 BENCH_ONLY=deep python bench_all.py"
# wave 3: coverage rows
run phase_profile "python scripts/profile_phases_r4.py"
run market_row "BENCH_GRAPH=market: BENCH_ONLY=bfs,sssp,pr,cc,bc python bench_all.py"
run sharded1 "python scripts/bench_sharded1.py"
run ici_calibrate "python scripts/ici_calibrate.py"
run matrix   "bash scripts/bench_matrix.sh /root/repo/BENCH_MATRIX.jsonl"
echo "# SUITE DONE $(date -u +%H:%M:%S)" >> $OUT
