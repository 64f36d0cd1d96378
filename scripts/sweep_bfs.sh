#!/usr/bin/env bash
# Option-matrix sweep for BFS, mirroring the reference's per-app run.sh
# (tests/bfs/run.sh): graph scales x direction-optimization x src policy.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-bfs_sweep}
mkdir -p "$OUT"
for scale in 16 18 20; do
  for dirflag in "" "--direction-optimized"; do
    for src in 0 largestdegree; do
      tag="s${scale}${dirflag:+_do}_src${src}"
      echo "== $tag"
      python -m gunrock_tpu bfs rmat --rmat_scale="$scale" \
        --rmat_edgefactor=16 --src="$src" $dirflag --quick \
        --jsonfile="$OUT/$tag.json" || exit 1
    done
  done
done
echo "records in $OUT/"
