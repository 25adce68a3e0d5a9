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

from nerf_pl_tpu.utils.compile_cache import DEFAULT_DIR as COMPILE_CACHE_DEFAULT


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
    val_every_steps: int = 0        # ALSO validate every N steps mid-epoch
                                    # (0 = epoch-boundary only; lightning's
                                    # val_check_interval analog — tightens
                                    # time-to-PSNR measurements)
    fused_mlp: bool = False         # use the Pallas fused point-MLP kernel
    fused_train: bool = False       # fully-fused train step (MLP+quadrature
                                    # fwd/bwd in single Pallas kernels)
    compile_cache: str = COMPILE_CACHE_DEFAULT
                                    # persistent XLA compilation cache dir
                                    # ('' disables; JAX_COMPILATION_CACHE_DIR
                                    # env var wins if set). Warm processes
                                    # skip minutes of remote compile.
    seed: int = 42
    num_workers: int = 0            # accepted for parity; data is on-device
    val_num: int = 1                # llff: DISTINCT nearest-center views
                                    # held out for validation (the reference
                                    # replicated one view per GPU instead)
    profile_dir: Optional[str] = None  # jax.profiler trace output dir
    # Occupancy-tightened training (training-side empty-space skipping):
    # after --occ_warmup_epochs, the current model's occupancy grid clips
    # every stored ray's [near, far] to its occupied interval so all
    # N_samples land in (near-)occupied space; refreshed every
    # --occ_refresh_epochs. Lets a tightened 32+32 run match dense 64+64
    # accuracy at ~half the FLOPs.
    occ_train: bool = False
    occ_warmup_epochs: int = 2
    occ_refresh_epochs: int = 4
    occ_N: int = 128                # occupancy grid resolution per axis
    occ_range: Optional[Sequence[float]] = None  # None = auto-derive
    occ_threshold: float = 1.0      # sigma above which a cell is occupied
    occ_margin: float = 0.1         # world-space slack around occupied spans
    occ_segments: int = 32          # per-ray occupied-segment mask bits
    #   (coarse samples concentrate in occupied segments; 0 = single
    #   tightened interval only)
    occ_dilate: int = 1             # widen occupied segment runs by this
    #   many segments per side so the sample bordering an empty gap lands
    #   where sigma is free to decay (train-render consistency)
    occ_keepalive: float = 0.0      # fraction of coarse sample mass spread
    #   uniformly over ALL segments (occupied placement only): keeps gap
    #   sigma supervised for dense-sampling evaluation
    occ_pack: bool = False          # survivor-packed batches: rays missing
    #   every occupancy box stop consuming step compute (their render is
    #   analytically the background; covered by a constant loss term)
    occ_mode: str = "sigma"         # grid cell criterion: "sigma" (raw
    #   density threshold) or "weight" (visibility-pruned: cells must also
    #   receive quadrature weight from some training ray — occluded junk
    #   density stops inflating the occupied set)


def validate_hparams(hp: Hparams) -> Hparams:
    """Single setup-time choke point for illegal flag combinations.

    Every fused-path restriction that used to fail deep inside a kernel
    (fused_train batch divisibility, fused_loss+TP in parallel/spmd.py,
    tile constraints in ops/fused_train.py) is rejected here with a message
    naming the flag to change."""
    import warnings
    if hp.batch_size % max(hp.num_gpus, 1):
        raise ValueError(
            f"--batch_size {hp.batch_size} must be divisible by "
            f"--num_gpus {hp.num_gpus} (global batch is split across the "
            "data mesh axis)")
    if hp.fused_train:
        per_chip = hp.batch_size // max(hp.num_gpus, 1)
        if per_chip % 8:
            raise ValueError(
                f"--fused_train needs a per-chip batch divisible by 8 "
                f"(Pallas ray-tile constraint); got --batch_size "
                f"{hp.batch_size} / --num_gpus {hp.num_gpus} = {per_chip}. "
                "Change --batch_size.")
        if hp.precision == "bfloat16":
            warnings.warn(
                "--precision bfloat16 with --fused_train selects bf16 "
                "MASTER weights + optimizer moments (the kernels run bf16 "
                "matmuls with f32 quadrature either way). Measured on-chip: "
                "zero step-time gain (BENCH_NOTES round-4 A/B) — prefer "
                "the default f32 masters", stacklevel=2)
    if hp.fused_train and hp.loss_type != "mse":
        warnings.warn(
            f"--loss_type {hp.loss_type}: the single-kernel loss-fused "
            "step only covers mse; falling back to the two-kernel "
            "custom-VJP fused path", stacklevel=2)
    if hp.occ_train:
        if hp.occ_warmup_epochs >= hp.num_epochs:
            warnings.warn(
                f"--occ_train never activates: --occ_warmup_epochs "
                f"{hp.occ_warmup_epochs} >= --num_epochs {hp.num_epochs}",
                stacklevel=2)
        if hp.occ_range is not None and len(hp.occ_range) not in (2, 6):
            raise ValueError(
                "--occ_range takes 2 values (symmetric lo hi) or 6 "
                "(lox loy loz hix hiy hiz); omit it to auto-derive from "
                "the model + cameras")
        if not 0 <= hp.occ_segments <= 32:
            raise ValueError(
                f"--occ_segments {hp.occ_segments} must be in [0, 32] "
                "(the per-ray mask packs into a uint32; 0 disables "
                "segment placement)")
        if hp.occ_segments > 0 and hp.use_disp:
            raise ValueError(
                "--occ_train segment placement assumes z-linear sampling; "
                "with --use_disp pass --occ_segments 0 (single tightened "
                "interval) instead")
        if hp.occ_dilate < 0:
            raise ValueError(f"--occ_dilate {hp.occ_dilate} must be >= 0")
        if not 0.0 <= hp.occ_keepalive < 1.0:
            raise ValueError(
                f"--occ_keepalive {hp.occ_keepalive} must be in [0, 1) "
                "(fraction of coarse sample mass spread over all segments)")
        if hp.occ_keepalive > 0 and hp.occ_segments == 0:
            raise ValueError(
                "--occ_keepalive applies to occupied-segment placement; "
                "it needs --occ_segments > 0")
        if hp.occ_mode not in ("sigma", "weight"):
            raise ValueError(
                f"--occ_mode {hp.occ_mode!r} must be 'sigma' or 'weight'")
    if hp.occ_pack and not hp.occ_train:
        raise ValueError(
            "--occ_pack requires --occ_train (survivor packing is driven "
            "by the training-side occupancy grid)")
    if hp.val_every_steps < 0:
        raise ValueError(
            f"--val_every_steps {hp.val_every_steps} must be >= 0 "
            "(0 = epoch-boundary validation only; a negative value would "
            "silently never fire)")
    return hp


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
    parser.add_argument('--val_every_steps', type=int, default=0,
                        help='ALSO run validation every N steps mid-epoch '
                             '(0 = epoch-boundary only). The analog of '
                             'lightning val_check_interval; rounds up to the '
                             'next scan-segment boundary. Mid-epoch vals log '
                             'and print but do not checkpoint (top-k and '
                             'last.ckpt stay epoch-granular for resume '
                             'semantics)')
    parser.add_argument('--compile_cache', type=str,
                        default=COMPILE_CACHE_DEFAULT,
                        help='persistent XLA compilation cache directory; '
                             'compiled executables are reused across '
                             'processes (minutes of remote compile under '
                             'the TPU tunnel become ~0 when warm). Pass an '
                             'empty string to disable; a set '
                             'JAX_COMPILATION_CACHE_DIR env var takes '
                             'precedence')
    parser.add_argument('--fused_mlp', default=False, action='store_true',
                        help='use the Pallas fused point-MLP kernel')
    parser.add_argument('--fused_train', default=False, action='store_true',
                        help='fully-fused training step: MLP + volume '
                             'quadrature forward/backward in single Pallas '
                             'kernels (fastest; default NeRF arch only)')
    parser.add_argument('--seed', type=int, default=42, help='PRNG seed')
    parser.add_argument('--num_workers', type=int, default=0,
                        help='unused (data lives on device); kept for parity')
    parser.add_argument('--val_num', type=int, default=1,
                        help='llff: number of DISTINCT nearest-center views '
                             'held out for validation (the reference '
                             'replicated one view across GPUs; sharded '
                             'validation needs no replication, so extra '
                             'budget buys genuinely novel held-out views)')
    parser.add_argument('--profile_dir', type=str, default=None,
                        help='capture a jax.profiler trace of one training '
                             'segment into this directory')
    parser.add_argument('--occ_train', default=False, action='store_true',
                        help='occupancy-tightened training: after warmup, '
                             'clip every stored ray\'s [near,far] to its '
                             'occupied interval from the current model\'s '
                             'occupancy grid (training-side empty-space '
                             'skipping; pairs with reduced --N_samples)')
    parser.add_argument('--occ_warmup_epochs', type=int, default=2,
                        help='epochs of dense training before the first '
                             'occupancy tightening')
    parser.add_argument('--occ_refresh_epochs', type=int, default=4,
                        help='epochs between grid rebuild + re-tighten')
    parser.add_argument('--occ_segments', type=int, default=32,
                        help='per-ray occupied-segment mask resolution '
                             '(coarse samples then concentrate in occupied '
                             'segments of the tightened interval, skipping '
                             'interior gaps); 0 = single-interval '
                             'tightening only')
    parser.add_argument('--occ_dilate', type=int, default=1,
                        help='widen occupied segment runs by this many '
                             'segments per side (the sample bordering an '
                             'empty gap then lands where sigma can decay '
                             'to zero, keeping the trained field '
                             'consistent with dense rendering); 0 = off')
    parser.add_argument('--occ_keepalive', type=float, default=0.0,
                        help='fraction of the coarse sample mass placed '
                             'uniformly over ALL segments when '
                             'occupied-segment placement is active — '
                             'keeps interior-gap sigma supervised for '
                             'dense-sampling eval; 0 = off. Measured '
                             'accuracy-neutral at the culled32 recipe '
                             '(16-epoch A/B, 25-view test: 34.52 dB at '
                             '0.1 vs 34.49 off — PARITY.md); both gates '
                             'pass above dense, so it is optional '
                             'insurance, not required')
    parser.add_argument('--occ_pack', default=False, action='store_true',
                        help='survivor-packed training batches: rays that '
                             'miss every occupancy box (analytic '
                             'background, zero gradient) stop consuming '
                             'step compute — throughput scales by '
                             'total/surviving rays (NerfAcc-style ray '
                             'culling)')
    parser.add_argument('--occ_mode', type=str, default='sigma',
                        choices=['sigma', 'weight'],
                        help='grid cell criterion: sigma = raw density '
                             'threshold; weight = visibility-pruned '
                             '(a cell must also receive quadrature weight '
                             'alpha*transmittance from some training ray, '
                             'so junk density behind opaque surfaces — '
                             'which gets ~zero gradient during training — '
                             'stops inflating the occupied set and '
                             'defeating interval tightening)')
    parser.add_argument('--occ_N', type=int, default=128,
                        help='occupancy grid resolution per axis')
    parser.add_argument('--occ_range', nargs='+', type=float, default=None,
                        help='grid world extent: 2 values (symmetric lo hi) '
                             'or 6 (lox loy loz hix hiy hiz); omit to '
                             'auto-derive from the model + cameras')
    parser.add_argument('--occ_threshold', type=float, default=1.0,
                        help='sigma above which a grid cell is occupied')
    parser.add_argument('--occ_margin', type=float, default=0.1,
                        help='world-space slack kept around occupied spans')

    args = parser.parse_args(argv)
    return validate_hparams(Hparams(**vars(args)))
