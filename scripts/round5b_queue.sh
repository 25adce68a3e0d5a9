#!/bin/bash
# Round-5b TPU measurement queue: runs AFTER scripts/round5_queue.sh
# finishes (pass its PID as $1 to wait on it; no arg = run immediately).
#   bash scripts/round5b_queue.sh [wait_pid] [stage ...]
# Stages:
#   bchunk     re-measure the hard400 render matrix with the per-bucket
#              equal-point-work tile sizes (3-tier default + 4-tier fast)
#   nsfine     north-star re-run, cold cache, --val_every_steps 2000 for
#              fine-grained threshold crossings (also populates the
#              persistent compile cache for the warm run)
#   nswarm     same recipe again with the now-warm compile cache — the
#              production cold-start story
set -x
cd "$(dirname "$0")/.."
WAIT_PID="$1"; shift 2>/dev/null
if [ -n "$WAIT_PID" ] && [ -e "/proc/$WAIT_PID" ]; then
  echo "waiting on pid $WAIT_PID"; while [ -e "/proc/$WAIT_PID" ]; do sleep 20; done
fi
STAGES="${@:-bchunk nsfine nswarm}"

run() { timeout 7200 "$@"; }

NS_FLAGS="--dataset_name blender --root_dir data/hard_blender \
  --img_wh 400 400 --N_importance 64 --num_epochs 8 --batch_size 1024 \
  --lr 5e-4 --lr_scheduler steplr --decay_step 2 4 8 --decay_gamma 0.5 \
  --fused_train --N_samples 32 --occ_train --occ_warmup_epochs 2 \
  --occ_refresh_epochs 2 --occ_segments 32 --occ_dilate 1 --occ_pack \
  --val_every_steps 2000"

for s in $STAGES; do case $s in
bchunk)
  run python scripts/bench_render.py --root_dir data/hard_blender \
    --ckpt_path ckpts/hard400_c48/last.ckpt --img_wh 800 800 \
    --occ_mode weight --occ_N 160 --chunk 40960 --repeats 4 \
    --configs dense budgets segments \
    --json_out docs/bench/render_matrix_hard400_bchunk3_r5.json
  run python scripts/bench_render.py --root_dir data/hard_blender \
    --ckpt_path ckpts/hard400_c48/last.ckpt --img_wh 800 800 \
    --occ_mode weight --occ_N 160 --chunk 40960 --repeats 4 \
    --configs dense budgets segments \
    --bucket_fracs 0.125 0.25 0.5 1.0 \
    --json_out docs/bench/render_matrix_hard400_bchunk4_r5.json
  ;;
nsfine)
  rm -rf ckpts/ns_fine
  run python scripts/northstar.py \
    --json_out docs/bench/northstar_fine_cold.json -- \
    $NS_FLAGS --compile_cache ~/.cache/ns_cache --exp_name ns_fine
  ;;
nswarm)
  rm -rf ckpts/ns_warm
  run python scripts/northstar.py \
    --json_out docs/bench/northstar_fine_warm.json -- \
    $NS_FLAGS --compile_cache ~/.cache/ns_cache --exp_name ns_warm
  ;;
*) echo "unknown stage $s" ;;
esac; done
