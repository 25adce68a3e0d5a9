"""Training configuration / CLI flags.

Flag surface parity: reference opt.py:3-78 (every flag preserved, same
defaults), plus TPU-specific additions kept at the end: --precision,
--num_chips (alias of the reference's --num_gpus), --val_chunk, --steps,
--log_every, --val_every, --data_on_device, --fused_mlp.
"""
from __future__ import annotations

import argparse
import dataclasses
from typing import List, Optional, Sequence


@dataclasses.dataclass
class Hparams:
    root_dir: str = "/data/nerf_synthetic/lego"
    dataset_name: str = "blender"
    img_wh: Sequence[int] = (800, 800)
    spheric_poses: bool = False

    N_samples: int = 64
    N_importance: int = 128
    use_disp: bool = False
    perturb: float = 1.0
    noise_std: float = 1.0

    loss_type: str = "mse"

    batch_size: int = 1024
    chunk: int = 32 * 1024
    num_epochs: int = 16
    num_gpus: int = 1  # reference name; here: number of TPU chips (data axis)

    ckpt_path: Optional[str] = None
    prefixes_to_ignore: Sequence[str] = ("loss",)

    optimizer: str = "adam"
    lr: float = 5e-4
    momentum: float = 0.9
    weight_decay: float = 0.0
    lr_scheduler: str = "steplr"
    warmup_multiplier: float = 1.0
    warmup_epochs: int = 0
    decay_step: Sequence[int] = (20,)
    decay_gamma: float = 0.1
    poly_exp: float = 0.9

    exp_name: str = "exp"

    # --- TPU-native additions -------------------------------------------
    precision: str = "float32"      # 'float32' | 'bfloat16' (MLP compute dtype)
    val_chunk: int = 8192           # rays per tile in full-image val renders
    log_every: int = 100            # steps between scalar logs
    scan_steps: int = 100           # steps fused into one on-device lax.scan
    fused_mlp: bool = False         # use the Pallas fused point-MLP kernel
    fused_train: bool = False       # fully-fused train step (MLP+quadrature
                                    # fwd/bwd in single Pallas kernels)
    seed: int = 42
    num_workers: int = 0            # accepted for parity; data is on-device
    profile_dir: Optional[str] = None  # jax.profiler trace output dir


def get_opts(argv: Optional[List[str]] = None) -> Hparams:
    parser = argparse.ArgumentParser()

    parser.add_argument('--root_dir', type=str,
                        default='/data/nerf_synthetic/lego',
                        help='path to the scene data directory')
    parser.add_argument('--dataset_name', type=str, default='blender',
                        choices=['blender', 'llff'],
                        help='dataset family (synthetic blender scenes or COLMAP llff scenes)')
    parser.add_argument('--img_wh', nargs="+", type=int, default=[800, 800],
                        help='image resolution as WIDTH HEIGHT')
    parser.add_argument('--spheric_poses', default=False, action="store_true",
                        help='llff scene captured on a 360-degree (spheric) camera path')

    parser.add_argument('--N_samples', type=int, default=64,
                        help='stratified samples per ray for the coarse pass')
    parser.add_argument('--N_importance', type=int, default=128,
                        help='extra importance-sampled points per ray for the fine pass')
    parser.add_argument('--use_disp', default=False, action="store_true",
                        help='sample linearly in disparity instead of depth')
    parser.add_argument('--perturb', type=float, default=1.0,
                        help='stratified-jitter strength for depth samples (0 disables)')
    parser.add_argument('--noise_std', type=float, default=1.0,
                        help='stddev of the gaussian noise regularizing raw sigma')

    parser.add_argument('--loss_type', type=str, default='mse',
                        choices=['mse'], help='training loss')

    parser.add_argument('--batch_size', type=int, default=1024,
                        help='batch size (global, across all chips)')
    parser.add_argument('--chunk', type=int, default=32 * 1024,
                        help='max rays in flight per forward pass (memory bound); caps the val/eval render tile')
    parser.add_argument('--num_epochs', type=int, default=16,
                        help='epochs to train for')
    parser.add_argument('--num_gpus', '--num_chips', type=int, default=1,
                        dest='num_gpus',
                        help='number of TPU chips on the data axis')

    parser.add_argument('--ckpt_path', type=str, default=None,
                        help='checkpoint to resume or warm-start from')
    parser.add_argument('--prefixes_to_ignore', nargs='+', type=str,
                        default=['loss'],
                        help='parameter-path prefixes skipped during partial checkpoint loads')

    parser.add_argument('--optimizer', type=str, default='adam',
                        choices=['sgd', 'adam', 'radam', 'ranger'],
                        help='optimizer family')
    parser.add_argument('--lr', type=float, default=5e-4,
                        help='base learning rate')
    parser.add_argument('--momentum', type=float, default=0.9,
                        help='sgd momentum coefficient')
    parser.add_argument('--weight_decay', type=float, default=0,
                        help='L2 weight-decay coefficient')
    parser.add_argument('--lr_scheduler', type=str, default='steplr',
                        choices=['steplr', 'cosine', 'poly'],
                        help='learning-rate schedule family')
    parser.add_argument('--warmup_multiplier', type=float, default=1.0,
                        help='target multiple of the base lr reached at the end of warmup')
    parser.add_argument('--warmup_epochs', type=int, default=0,
                        help='epochs over which to linearly ramp up the learning rate')
    parser.add_argument('--decay_step', nargs='+', type=int, default=[20],
                        help='epoch milestones at which steplr multiplies the lr by --decay_gamma')
    parser.add_argument('--decay_gamma', type=float, default=0.1,
                        help='multiplicative lr decay factor at each milestone')
    parser.add_argument('--poly_exp', type=float, default=0.9,
                        help='power of the polynomial lr decay curve')

    parser.add_argument('--exp_name', type=str, default='exp',
                        help='run name used for log and checkpoint directories')

    # --- TPU-native additions -------------------------------------------
    parser.add_argument('--precision', type=str, default='float32',
                        choices=['float32', 'bfloat16'],
                        help='MLP compute dtype (params stay float32)')
    parser.add_argument('--val_chunk', type=int, default=8192,
                        help='rays per tile for full-image val renders')
    parser.add_argument('--log_every', type=int, default=100,
                        help='steps between scalar logs')
    parser.add_argument('--scan_steps', type=int, default=100,
                        help='train steps fused into one on-device lax.scan')
    parser.add_argument('--fused_mlp', default=False, action='store_true',
                        help='use the Pallas fused point-MLP kernel')
    parser.add_argument('--fused_train', default=False, action='store_true',
                        help='fully-fused training step: MLP + volume '
                             'quadrature forward/backward in single Pallas '
                             'kernels (fastest; default NeRF arch only)')
    parser.add_argument('--seed', type=int, default=42, help='PRNG seed')
    parser.add_argument('--num_workers', type=int, default=0,
                        help='unused (data lives on device); kept for parity')
    parser.add_argument('--profile_dir', type=str, default=None,
                        help='capture a jax.profiler trace of one training '
                             'segment into this directory')

    args = parser.parse_args(argv)
    return Hparams(**vars(args))
