#!/bin/bash
# Round-4 auto-measure, snapshot edition: runs the suite from the frozen
# HEAD clone in .benchsnap so live edits in /root/repo cannot contaminate
# later measurement rows. Appends to the same bench_r4_auto.jsonl.
# (The flagship row already ran from the live tree before the snapshot.)
cd /root/repo/.benchsnap || exit 1
OUT=/root/repo/bench_r4_auto.jsonl
for i in $(seq 1 600); do
  if timeout 90 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    echo "# TPU up (snap) at $(date -u +%H:%M:%S)" >> $OUT
    break
  fi
  sleep 60
done
timeout 90 python -c "import jax; assert jax.devices()" 2>/dev/null || exit 1
run() {
  echo "# $1 start $(date -u +%H:%M:%S)" >> $OUT
  timeout 3000 bash -c "$2" >> $OUT 2>&1
  echo "# $1 exit=$? $(date -u +%H:%M:%S)" >> $OUT
}
run table    "python bench_all.py"
run deep     "BENCH_ONLY=deep python bench_all.py"
run tc       "BENCH_ONLY=tc python bench_all.py"
run fused_ab "python scripts/fused_ab_r4.py"
run value_ab "python scripts/value_ab_r3.py"
run sharded1 "python scripts/bench_sharded1.py"
run profile  "python scripts/profile_deep_r3.py"
run matrix   "bash scripts/bench_matrix.sh /root/repo/BENCH_MATRIX.jsonl"
echo "# SUITE DONE $(date -u +%H:%M:%S)" >> $OUT
