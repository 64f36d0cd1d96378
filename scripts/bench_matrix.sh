#!/usr/bin/env bash
# Per-graph benchmark matrix — the generatable rows of BASELINE.md's
# engine table (reference doc/stats/engines_topc.md graphs:
# soc-orkut-class rmat rows + rgg_n24 + a road-like grid;
# dataset/test-scripts/ipdps17/run_fig2.sh is the reference driver).
#
#   scripts/bench_matrix.sh [out.jsonl]
#
# Each bench_all invocation is one dataset (fresh process => fresh HBM);
# rows append to the output so an interrupted sweep resumes by rerunning.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-BENCH_MATRIX.jsonl}"

graphs=(
  "rmat:20:32"      # flagship (soc-orkut class: 60.7M edges)
  "rgg:22"          # rgg row (road-shaped; BASELINE rgg_n24 class)
  "grid:1448"       # road_usa-class diameter row (V=2.1M, depth ~2894)
  "market:/root/reference/simple_example/bips98_606.mtx"  # real dataset
  # Larger rows (rmat22e64 / rmat23 / rmat24e16 / rgg24) exceed the
  # measurement window on the tunnel (round 4: rmat22e64 alone blew the
  # 50-min cap in graph build + compile); run them individually with
  # BENCH_GRAPH=... when a long window is available.
)

tag_of() {
  case "$1" in
    rmat:20:32) echo "rmat20" ;;
    rmat:*) echo "$1" | awk -F: '{printf "rmat%se%s", $2, $3}' ;;
    rgg:*)  echo "rgg${1#rgg:}" ;;
    grid:*) echo "grid${1#grid:}" ;;
    market:*) basename "${1#market:}" .mtx ;;
  esac
}

for gspec in "${graphs[@]}"; do
  tag=$(tag_of "$gspec")
  if [ -f "$OUT" ] && grep -q "_${tag}\"" "$OUT"; then
    echo "# $gspec ($tag) already in $OUT — skipping" >&2
    continue
  fi
  echo "# benching $gspec" >&2
  BENCH_GRAPH="$gspec" BENCH_ONLY="bfs,sssp,pr,cc,bc" \
    timeout 3000 python bench_all.py >> "$OUT"
done
cat "$OUT"
