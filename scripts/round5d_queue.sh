#!/bin/bash
# Round-5d: BASE culled-tile sweep for the cost-capped bucket tiles.
# Every historical culled row ran at base chunk 20480 (bench_render
# clamped it unconditionally until round 5; --culled_chunk now exposes
# it). The _TILE_COST_REF=32 cap sizes each bucket's tile relative to
# this base, so it is the remaining free lever: larger tiles amortize
# per-launch overhead on the big cheap bucket, smaller tiles pad less
# tail. q_r5c re-measures the 20480 base; this sweeps 40960 and 10240.
# Chain: bash scripts/round5d_queue.sh [pid]
set -x
cd "$(dirname "$0")/.."
WAIT_PID="$1"
if [ -n "$WAIT_PID" ] && [ -e "/proc/$WAIT_PID" ]; then
  echo "waiting on pid $WAIT_PID"; while [ -e "/proc/$WAIT_PID" ]; do sleep 20; done
fi
run() { timeout 7200 "$@"; }
run python scripts/bench_render.py --root_dir data/hard_blender \
  --ckpt_path ckpts/hard400_c48/last.ckpt --img_wh 800 800 \
  --occ_mode weight --occ_N 160 --culled_chunk 40960 --repeats 4 \
  --configs dense budgets segments \
  --json_out docs/bench/render_matrix_hard400_costcap3_b40k_r5.json
run python scripts/bench_render.py --root_dir data/hard_blender \
  --ckpt_path ckpts/hard400_c48/last.ckpt --img_wh 800 800 \
  --occ_mode weight --occ_N 160 --culled_chunk 10240 --repeats 4 \
  --configs dense budgets segments \
  --json_out docs/bench/render_matrix_hard400_costcap3_b10k_r5.json
run python scripts/bench_render.py --root_dir data/hard_blender \
  --ckpt_path ckpts/hard400_c48/last.ckpt --img_wh 800 800 \
  --occ_mode weight --occ_N 160 --culled_chunk 40960 --repeats 4 \
  --configs budgets segments \
  --bucket_fracs 0.125 0.25 0.5 1.0 \
  --json_out docs/bench/render_matrix_hard400_costcap4_b40k_r5.json
