#!/bin/bash
# Round-5e: continue the base-tile descent (40960 -> 1.045 s, 20480 ->
# 1.001, 10240 -> 0.946 on the 3-tier segments row) below 10240, and
# capture one NERF_OCC_TIMING decomposition at the best base so the
# remaining frame time is attributed (cull pass vs per-bucket renders).
# Chain: bash scripts/round5e_queue.sh [pid]
set -x
cd "$(dirname "$0")/.."
WAIT_PID="$1"
if [ -n "$WAIT_PID" ] && [ -e "/proc/$WAIT_PID" ]; then
  echo "waiting on pid $WAIT_PID"; while [ -e "/proc/$WAIT_PID" ]; do sleep 20; done
fi
run() { timeout 7200 "$@"; }
run python scripts/bench_render.py --root_dir data/hard_blender \
  --ckpt_path ckpts/hard400_c48/last.ckpt --img_wh 800 800 \
  --occ_mode weight --occ_N 160 --culled_chunk 8192 --repeats 4 \
  --configs dense budgets segments \
  --json_out docs/bench/render_matrix_hard400_costcap3_b8k_r5.json
run python scripts/bench_render.py --root_dir data/hard_blender \
  --ckpt_path ckpts/hard400_c48/last.ckpt --img_wh 800 800 \
  --occ_mode weight --occ_N 160 --culled_chunk 5120 --repeats 4 \
  --configs budgets segments \
  --json_out docs/bench/render_matrix_hard400_costcap3_b5k_r5.json
NERF_OCC_TIMING=1 run python scripts/bench_render.py \
  --root_dir data/hard_blender \
  --ckpt_path ckpts/hard400_c48/last.ckpt --img_wh 800 800 \
  --occ_mode weight --occ_N 160 --culled_chunk 10240 --repeats 2 \
  --configs segments \
  --json_out docs/bench/render_matrix_hard400_timing_b10k_r5.json
