#!/bin/bash
# Round-4 wave E: recovery + consolidated remainder. The backend wedged
# at ~01:15 (orphaned giant TC execution); this polls until a trivial
# device op completes, then runs every outstanding row from the live
# tree (fused v2 A/B supersedes the snapshot's old-fused A/B).
cd /root/repo
OUT=bench_r4_auto.jsonl
for i in $(seq 1 600); do
  if timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((128,))))" 2>/dev/null; then
    echo "# TPU recovered at $(date -u +%H:%M:%S)" >> $OUT
    break
  fi
  sleep 60
done
timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((128,))))" 2>/dev/null || exit 1
run() {
  echo "# $1 start $(date -u +%H:%M:%S)" >> $OUT
  timeout ${3:-3000} bash -c "$2" >> $OUT 2>&1
  echo "# $1 exit=$? $(date -u +%H:%M:%S)" >> $OUT
}
run probe_scatter2 "python scripts/probe_scatter_r4.py"
run fused_v2_ab "python scripts/fused_ab_r4.py"
run probe_deep "python scripts/probe_deep_r4.py"
run tc_fixed "BENCH_ONLY=tc python bench_all.py"
run deep_off "GUNROCK_BFS_DEEP=0 GUNROCK_SSSP_DEEP=0 BENCH_ONLY=deep python bench_all.py"
run sssp_pulldiv4096_fused "GUNROCK_SSSP_FUSED=1 GUNROCK_SSSP_PULL_DIV=4096 BENCH_ONLY=sssp python bench_all.py"
run value_ab "python scripts/value_ab_r3.py"
run profile_deep "python scripts/profile_deep_r3.py"
run phase_profile "python scripts/profile_phases_r4.py"
run market_row "BENCH_GRAPH=market: BENCH_ONLY=bfs,sssp,pr,cc,bc python bench_all.py"
run sharded1 "python scripts/bench_sharded1.py"
run ici_calibrate "python scripts/ici_calibrate.py"
run matrix "bash scripts/bench_matrix.sh /root/repo/BENCH_MATRIX.jsonl"
echo "# WAVEE DONE $(date -u +%H:%M:%S)" >> $OUT
