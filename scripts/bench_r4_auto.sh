#!/bin/bash
# Round-4 auto-measure: waits for the TPU tunnel, then captures the full
# benchmark suite into bench_r4_auto.jsonl. Safe to re-run; appends with
# timestamps. Resolves the round-3 queued A/Bs plus round-4 rows.
cd /root/repo
OUT=bench_r4_auto.jsonl
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
  timeout 3000 bash -c "$2" >> $OUT 2>&1
  echo "# $1 exit=$? $(date -u +%H:%M:%S)" >> $OUT
}
run flagship "python bench.py"
run table    "python bench_all.py"
run deep     "BENCH_ONLY=deep python bench_all.py"
run tc       "BENCH_ONLY=tc python bench_all.py"
run sharded1 "python scripts/bench_sharded1.py"
run profile  "python scripts/profile_deep_r3.py"
run matrix   "bash scripts/bench_matrix.sh BENCH_MATRIX.jsonl"
run value_ab "python scripts/value_ab_r3.py"
run fused_ab "python scripts/fused_ab_r4.py"
