#!/bin/bash
# Round-5 TPU measurement queue (VERDICT r4 items, in priority order).
# Run from the repo root when the axon tunnel is up:
#   bash scripts/round5_queue.sh [stage ...]   # default: all stages
# Each stage is idempotent-ish (separate output files); wrap in timeout
# so a tunnel outage doesn't wedge the queue. Stages:
#   matrix     re-measure the render matrix with symmetric timing (ADVICE r4)
#   headroom   occ_N / bucket_fracs sweep for render margin (VERDICT #4)
#   northstar  wall-clock time-to-PSNR artifact (VERDICT #2)
#   keepalive  culled32 +- occ_keepalive accuracy A/B (VERDICT #5)
#   dense      dense retrain + full 25-view audit (VERDICT #7)
#   llff       culled training + render matrix on hard_llff (VERDICT #1)
#   sph63      63-camera spheric ring (view-sparsity diagnosis, VERDICT #6)
set -x
cd "$(dirname "$0")/.."
STAGES="${@:-matrix headroom northstar keepalive dense llff sph63}"

run() { timeout 7200 "$@"; }

for s in $STAGES; do case $s in
matrix)
  run python scripts/bench_render.py --root_dir data/hard_blender \
    --ckpt_path ckpts/hard400_c48/last.ckpt --img_wh 800 800 \
    --occ_mode weight --occ_N 160 --chunk 40960 --repeats 4 \
    --json_out docs/bench/render_matrix_hard400_r5.json
  ;;
headroom)
  run python scripts/bench_render.py --root_dir data/hard_blender \
    --ckpt_path ckpts/hard400_c48/last.ckpt --img_wh 800 800 \
    --occ_mode weight --occ_N 160 --chunk 40960 --repeats 4 \
    --configs dense budgets segments \
    --bucket_fracs 0.125 0.25 0.5 1.0 \
    --json_out docs/bench/render_matrix_hard400_4tier_r5.json
  run python scripts/bench_render.py --root_dir data/hard_blender \
    --ckpt_path ckpts/hard400_c48/last.ckpt --img_wh 800 800 \
    --occ_mode weight --occ_N 224 --chunk 40960 --repeats 4 \
    --configs segments \
    --bucket_fracs 0.0625 0.125 0.25 0.5 1.0 \
    --json_out docs/bench/render_matrix_hard400_5tier_n224_r5.json
  ;;
northstar)
  run python scripts/northstar.py \
    --json_out docs/bench/northstar.json -- \
    --dataset_name blender --root_dir data/hard_blender \
    --img_wh 400 400 --N_importance 64 --num_epochs 16 --batch_size 1024 \
    --lr 5e-4 --lr_scheduler steplr --decay_step 2 4 8 --decay_gamma 0.5 \
    --fused_train --N_samples 32 --occ_train --occ_warmup_epochs 2 \
    --occ_refresh_epochs 2 --occ_segments 32 --occ_dilate 1 --occ_pack \
    --exp_name ns_c32
  ;;
keepalive)
  run python train.py --dataset_name blender --root_dir data/hard_blender \
    --img_wh 400 400 --N_importance 64 --num_epochs 16 --batch_size 1024 \
    --lr 5e-4 --lr_scheduler steplr --decay_step 2 4 8 --decay_gamma 0.5 \
    --fused_train --N_samples 32 --occ_train --occ_warmup_epochs 2 \
    --occ_refresh_epochs 2 --occ_segments 32 --occ_dilate 1 --occ_pack \
    --occ_keepalive 0.1 --exp_name hard400_c32k
  run python eval.py --dataset_name blender --root_dir data/hard_blender \
    --img_wh 400 400 --N_importance 64 --scene_name hard400_c32k \
    --ckpt_path ckpts/hard400_c32k/last.ckpt --fused_mlp --save_gt \
    --metrics_out docs/parity/hard400_c32k/metrics.json
  ;;
dense)
  run python train.py --dataset_name blender --root_dir data/hard_blender \
    --img_wh 400 400 --N_importance 64 --num_epochs 16 --batch_size 1024 \
    --lr 5e-4 --lr_scheduler steplr --decay_step 2 4 8 --decay_gamma 0.5 \
    --fused_train --exp_name hard400_dense
  run python eval.py --dataset_name blender --root_dir data/hard_blender \
    --img_wh 400 400 --N_importance 64 --scene_name hard400_dense \
    --ckpt_path ckpts/hard400_dense/last.ckpt --fused_mlp --save_gt \
    --metrics_out docs/parity/hard400_dense/metrics.json
  ;;
llff)
  # culled training at the fern recipe (the dense row exists: PARITY.md
  # 34.56 dB); gate test_train + novel-val against it
  run python train.py --dataset_name llff --root_dir data/hard_llff \
    --N_importance 64 --img_wh 504 378 --num_epochs 30 --batch_size 1024 \
    --optimizer adam --lr 5e-4 --lr_scheduler steplr \
    --decay_step 10 20 --decay_gamma 0.5 --fused_train \
    --N_samples 48 --occ_train --occ_warmup_epochs 4 \
    --occ_refresh_epochs 2 --occ_segments 32 --occ_dilate 1 --occ_pack \
    --occ_mode weight --val_num 3 --exp_name hardllff_c48
  run python eval.py --dataset_name llff --root_dir data/hard_llff \
    --img_wh 504 378 --N_importance 64 --scene_name hardllff_c48 \
    --ckpt_path ckpts/hardllff_c48/last.ckpt --fused_mlp --split val \
    --val_num 3 --save_gt \
    --metrics_out docs/parity/hardllff_c48/metrics.json
  # dense baseline at the same val_num for symmetric novel-view scoring
  run python train.py --dataset_name llff --root_dir data/hard_llff \
    --N_importance 64 --img_wh 504 378 --num_epochs 30 --batch_size 1024 \
    --optimizer adam --lr 5e-4 --lr_scheduler steplr \
    --decay_step 10 20 --decay_gamma 0.5 --fused_train \
    --val_num 3 --exp_name hardllff_dense
  run python eval.py --dataset_name llff --root_dir data/hard_llff \
    --img_wh 504 378 --N_importance 64 --scene_name hardllff_dense \
    --ckpt_path ckpts/hardllff_dense/last.ckpt --fused_mlp --split val \
    --val_num 3 --save_gt \
    --metrics_out docs/parity/hardllff_dense/metrics.json
  # render matrix on the NDC checkpoint (measures whether cull pays in a
  # forward-facing frustum; a measured negative is an acceptable result)
  run python scripts/bench_render.py --root_dir data/hard_llff \
    --dataset_name llff --split val --ckpt_path ckpts/hardllff_dense/last.ckpt \
    --img_wh 504 378 --occ_mode weight --occ_N 160 --chunk 40960 \
    --repeats 4 --json_out docs/bench/render_matrix_hardllff_r5.json
  ;;
sph63)
  run python train.py --dataset_name llff --root_dir data/hard_llff_sph63 \
    --spheric_poses --N_importance 64 --img_wh 504 378 --num_epochs 30 \
    --batch_size 1024 --optimizer adam --lr 5e-4 --lr_scheduler steplr \
    --decay_step 10 20 --decay_gamma 0.5 --fused_train \
    --val_num 3 --exp_name hardsph63
  run python eval.py --dataset_name llff --root_dir data/hard_llff_sph63 \
    --spheric_poses --img_wh 504 378 --N_importance 64 \
    --scene_name hardsph63 --ckpt_path ckpts/hardsph63/last.ckpt \
    --fused_mlp --split val --val_num 3 --save_gt \
    --metrics_out docs/parity/hardsph63/metrics.json
  ;;
*) echo "unknown stage $s" ;;
esac; done
