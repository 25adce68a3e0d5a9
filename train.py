#!/usr/bin/env python
"""Train a NeRF on TPU.

CLI parity with the reference train.py/opt.py (kwea123/nerf_pl):

    python train.py --dataset_name blender --root_dir <scene> \
        --N_importance 64 --img_wh 400 400 --num_epochs 16 \
        --batch_size 1024 --lr 5e-4 --lr_scheduler steplr \
        --decay_step 2 4 8 --decay_gamma 0.5 --exp_name exp

Scaling is declarative: --num_gpus N puts N chips on the data mesh axis
(no DDP processes; SURVEY.md C22-C23).
"""
from nerf_pl_tpu.config import get_opts
from nerf_pl_tpu.training.system import NeRFSystem


def main():
    hparams = get_opts()
    system = NeRFSystem(hparams)
    final = system.fit()
    if final:
        print(f"[done] val/psnr={final.get('val/psnr', float('nan')):.2f} "
              f"val/ssim={final.get('val/ssim', float('nan')):.3f}")


if __name__ == "__main__":
    main()
