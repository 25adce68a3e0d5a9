#!/bin/bash
# Round-5c: re-measure the hard400 render matrices with the refined
# cost-capped per-bucket tiles (_TILE_COST_REF=32: only buckets costlier
# than 32 samples/ray shrink). Chain: bash scripts/round5c_queue.sh [pid]
set -x
cd "$(dirname "$0")/.."
WAIT_PID="$1"
if [ -n "$WAIT_PID" ] && [ -e "/proc/$WAIT_PID" ]; then
  echo "waiting on pid $WAIT_PID"; while [ -e "/proc/$WAIT_PID" ]; do sleep 20; done
fi
run() { timeout 7200 "$@"; }
run python scripts/bench_render.py --root_dir data/hard_blender \
  --ckpt_path ckpts/hard400_c48/last.ckpt --img_wh 800 800 \
  --occ_mode weight --occ_N 160 --chunk 40960 --repeats 4 \
  --configs dense budgets segments \
  --json_out docs/bench/render_matrix_hard400_costcap3_r5.json
run python scripts/bench_render.py --root_dir data/hard_blender \
  --ckpt_path ckpts/hard400_c48/last.ckpt --img_wh 800 800 \
  --occ_mode weight --occ_N 160 --chunk 40960 --repeats 4 \
  --configs dense budgets segments \
  --bucket_fracs 0.125 0.25 0.5 1.0 \
  --json_out docs/bench/render_matrix_hard400_costcap4_r5.json
