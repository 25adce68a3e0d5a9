#!/bin/bash
# Round-5i: close the two measurement gaps in the cross-scene device-rays
# matrices (r5h):
#   1. The dense rows ran at --chunk 40960 while culled rows ran their swept
#      best (8192). Sweep the DENSE tile too (hard400, 800x800) so the
#      published ratio is best-config vs best-config in one window.
#   2. The hardllff/hardsph matrices used GT-less splits (psnr_vs_dense
#      only). Re-run on --split val so every row carries psnr_vs_gt.
# Chain: bash scripts/round5i_queue.sh [pid]
set -x
cd "$(dirname "$0")/.."
WAIT_PID="$1"
if [ -n "$WAIT_PID" ] && [ -e "/proc/$WAIT_PID" ]; then
  echo "waiting on pid $WAIT_PID"; while [ -e "/proc/$WAIT_PID" ]; do sleep 20; done
fi
run() { timeout 7200 "$@"; }

# 1a. hard400: dense at 8192 + segments in the same window
run python scripts/bench_render.py --root_dir data/hard_blender \
  --ckpt_path ckpts/hard400_c48/last.ckpt --img_wh 800 800 \
  --occ_mode weight --occ_N 160 --chunk 8192 --culled_chunk 8192 \
  --repeats 4 --configs dense segments \
  --json_out docs/bench/render_matrix_hard400_densechunk8k_r5.json

# 1b. hard400: dense at 20480 + segments in the same window
run python scripts/bench_render.py --root_dir data/hard_blender \
  --ckpt_path ckpts/hard400_c48/last.ckpt --img_wh 800 800 \
  --occ_mode weight --occ_N 160 --chunk 20480 --culled_chunk 8192 \
  --repeats 4 --configs dense segments \
  --json_out docs/bench/render_matrix_hard400_densechunk20k_r5.json

# 2. hardllff on the GT-bearing val split, dense tile matched to culled
run python scripts/bench_render.py --root_dir data/hard_llff \
  --dataset_name llff --split val --idx 0 --img_wh 504 378 \
  --ckpt_path ckpts/hardllff_dense/last.ckpt \
  --occ_mode weight --occ_N 160 --chunk 8192 --culled_chunk 8192 \
  --repeats 4 --configs dense tighten budgets segments \
  --json_out docs/bench/render_matrix_hardllff_val_r5.json

# 3. hardsph on the GT-bearing val split
run python scripts/bench_render.py --root_dir data/hard_llff_sph \
  --dataset_name llff --spheric_poses --split val --idx 0 --img_wh 504 378 \
  --ckpt_path ckpts/hardsph/last.ckpt \
  --occ_mode weight --occ_N 160 --chunk 8192 --culled_chunk 8192 \
  --repeats 4 --configs dense tighten budgets segments \
  --json_out docs/bench/render_matrix_hardsph_val_r5.json
