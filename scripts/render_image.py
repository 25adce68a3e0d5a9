#!/usr/bin/env python
"""Single-image inference: render one pose, report PSNR, depth map, timing.

The script equivalent of the reference's test.ipynb (SURVEY.md C21 / §3.5):
renders one dataset item through the full coarse+fine pipeline, measures
secs/frame with a synchronized second render (first render includes
compilation), and writes the prediction + JET depth map.

    python scripts/render_image.py --root_dir <scene> --dataset_name blender \
        --split test --idx 0 --img_wh 400 400 --N_importance 64 \
        --ckpt_path ckpts/exp/last.ckpt [--fused_mlp]
"""
import os
import sys
import time
from argparse import ArgumentParser

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main(argv=None):
    from nerf_pl_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()  # steady-state timing is post-compile either way
    parser = ArgumentParser()
    parser.add_argument('--root_dir', type=str, required=True)
    parser.add_argument('--dataset_name', type=str, default='blender',
                        choices=['blender', 'llff'])
    parser.add_argument('--split', type=str, default='test')
    parser.add_argument('--idx', type=int, default=0,
                        help='dataset item to render')
    parser.add_argument('--img_wh', nargs='+', type=int, default=[800, 800])
    parser.add_argument('--spheric_poses', default=False, action='store_true')
    parser.add_argument('--N_samples', type=int, default=64)
    parser.add_argument('--N_importance', type=int, default=64)
    parser.add_argument('--use_disp', default=False, action='store_true')
    parser.add_argument('--chunk', type=int, default=32 * 1024)
    parser.add_argument('--culled_chunk', type=int, default=None,
                        help='BASE ray tile for the occupancy-culled path '
                             '(default: CulledRenderer.DEFAULT_CHUNK=8192, '
                             'the measured round-5 optimum)')
    parser.add_argument('--ckpt_path', type=str, required=True)
    parser.add_argument('--fused_mlp', default=False, action='store_true')
    parser.add_argument('--occ_grid', default=False, action='store_true',
                        help='build an occupancy grid and skip empty-space '
                             'rays (near-parity culling: analytic '
                             'background substituted on provably-empty '
                             'rays)')
    parser.add_argument('--occ_threshold', type=float, default=1.0,
                        help='sigma above which a grid cell is occupied')
    parser.add_argument('--occ_mode', type=str, default='sigma',
                        choices=['sigma', 'weight'],
                        help='cell criterion: sigma = raw density '
                             'threshold; weight = visibility-pruned (keep '
                             'a cell only if this frame\'s rays deposit '
                             'quadrature weight on it)')
    parser.add_argument('--occ_range', nargs='+', type=float, default=None,
                        help='grid world extent: 2 values (symmetric lo hi)'
                             ' or 6 (box corners); omit to auto-derive')
    parser.add_argument('--occ_N', type=int, default=128,
                        help='occupancy grid resolution per axis')
    parser.add_argument('--occ_tighten', default=False, action='store_true',
                        help='also clip each surviving ray to its occupied '
                             'interval (concentrates samples; output no '
                             'longer bit-exact with the dense render)')
    parser.add_argument('--occ_budgets', default=False, action='store_true',
                        help='with tightening: short-span rays rendered '
                             'with proportionally fewer samples (density '
                             'never below the dense render)')
    parser.add_argument('--occ_segments', type=int, default=0,
                        help='per-ray occupied-segment mask bits (<=32): '
                             'samples concentrate in occupied segments, '
                             'skipping interior empty gaps; 0 = off')
    parser.add_argument('--occ_bucket_fracs', nargs='+', type=float,
                        default=None,
                        help='override the budgeted span-bucket sample '
                             'fractions (ascending, must end at 1.0); '
                             'e.g. 0.125 0.25 0.5 1.0 adds a cheaper '
                             'tier for very sparse rays')
    parser.add_argument('--out_dir', type=str, default='.')
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from nerf_pl_tpu.datasets import dataset_dict
    from nerf_pl_tpu.models import init_nerf_params
    from nerf_pl_tpu.parallel import Trainer, make_mesh
    from nerf_pl_tpu.rendering import ModelConfig, RenderConfig
    from nerf_pl_tpu.training import get_optimizer, loss_dict
    from nerf_pl_tpu.training.checkpoints import load_ckpt
    from nerf_pl_tpu.training.metrics import psnr as psnr_fn
    from nerf_pl_tpu.utils.visualization import visualize_depth

    w, h = args.img_wh
    kwargs = {'root_dir': args.root_dir, 'split': args.split,
              'img_wh': tuple(args.img_wh)}
    if args.dataset_name == 'llff':
        kwargs['spheric_poses'] = args.spheric_poses
    dataset = dataset_dict[args.dataset_name](**kwargs)
    sample = dataset[args.idx]

    mcfg = ModelConfig()
    kc, kf = jax.random.split(jax.random.PRNGKey(0))
    params = {"nerf_coarse": init_nerf_params(kc, mcfg.nerf),
              "nerf_fine": init_nerf_params(kf, mcfg.nerf)}
    params = load_ckpt(params, args.ckpt_path, "nerf_coarse")
    params = load_ckpt(params, args.ckpt_path, "nerf_fine")

    rcfg = RenderConfig(
        N_samples=args.N_samples, N_importance=args.N_importance,
        use_disp=args.use_disp, white_back=dataset.white_back,
        test_time=True, fused=args.fused_mlp)

    if args.occ_grid:
        from nerf_pl_tpu.rendering import (CulledRenderer,
                                           load_or_build_grid, rays_aabb)
        t0 = time.perf_counter()
        occ = load_or_build_grid(
            args.ckpt_path,
            params["nerf_fine" if args.N_importance > 0 else "nerf_coarse"],
            mcfg, N=args.occ_N, occ_range=args.occ_range,
            sigma_threshold=args.occ_threshold,
            aabb=rays_aabb(sample['rays']),
            mode=args.occ_mode,
            vis_rays=(sample['rays'] if args.occ_mode == 'weight'
                      else None))
        print(f"occupancy grid: {occ.n_boxes} boxes, "
              f"{occ.occupied_fraction * 100:.1f}% blocks occupied "
              f"({time.perf_counter() - t0:.1f}s build/load)")
        # default base tile: the measured optimum, capped at --chunk (see
        # eval.py); explicit 0 is rejected by CulledRenderer, not coerced
        cr = CulledRenderer(occ, rcfg, mcfg,
                            chunk=(args.culled_chunk
                                   if args.culled_chunk is not None else
                                   min(args.chunk,
                                       CulledRenderer.DEFAULT_CHUNK)),
                            tighten=(args.occ_tighten or args.occ_budgets
                                     or args.occ_segments > 0),
                            budgets=args.occ_budgets,
                            segments=args.occ_segments,
                            bucket_fracs=(tuple(args.occ_bucket_fracs)
                                          if args.occ_bucket_fracs else None))

        def render(params, rays):
            out, stats = cr(params, jnp.asarray(rays), return_stats=True)
            msg = (f"  culled {stats['n_rays'] - stats['n_survivors']}"
                   f"/{stats['n_rays']} rays")
            if "bucket_counts" in stats:
                msg += (f"; buckets {stats['bucket_counts']}"
                        f" (fracs {list(cr._BUCKET_FRACS)}),"
                        f" rendered {stats['n_rendered']}")
            print(msg)
            return out
    else:
        mesh = make_mesh(num_data=1)
        tr = Trainer(mesh, mcfg, rcfg, get_optimizer("adam", 1e-3),
                     lambda s: 1e-3, loss_dict["mse"], 1)
        # device_out: keep outputs on device so the timed repeat syncs on
        # compute completion, symmetric with the --occ_grid branch
        # (otherwise np.asarray inside render charges the host transfer
        # and block_until_ready below is a no-op — ADVICE round 4).
        render = tr.render_fn(rcfg, chunk=args.chunk, device_out=True)

    # First render compiles; the second measures steady-state secs/frame
    # (the reference's torch.cuda.synchronize timing, test.ipynb cell 3).
    # The timed repeat perturbs ray origins by 1e-6 (the axon relay
    # dedupes repeated identical (program, args) executions) and syncs on
    # COMPUTE completion, not device->host transfer (the tunnel moves
    # ~25 MB/s; a real host's PCIe link does not, so charging the
    # transfer would misstate the render — see BENCH_NOTES round 4).
    typ = "fine" if args.N_importance > 0 else "coarse"
    results = render(params, sample['rays'])
    jax.block_until_ready(results[f'rgb_{typ}'])
    rays_t = np.asarray(sample['rays'], np.float32).copy()
    rays_t[:, :3] += 1e-6
    t0 = time.perf_counter()
    results = render(params, rays_t)
    jax.block_until_ready(results[f'rgb_{typ}'])
    dt = time.perf_counter() - t0

    img_pred = np.clip(np.asarray(results[f'rgb_{typ}']).reshape(h, w, 3),
                       0, 1)
    os.makedirs(args.out_dir, exist_ok=True)
    Image.fromarray((img_pred * 255).astype(np.uint8)).save(
        os.path.join(args.out_dir, f'render_{args.idx:03d}.png'))
    depth = visualize_depth(np.asarray(results[f'depth_{typ}']).reshape(h, w))
    Image.fromarray((depth.transpose(1, 2, 0) * 255).astype(np.uint8)).save(
        os.path.join(args.out_dir, f'depth_{args.idx:03d}.png'))

    print(f"secs/frame ({w}x{h}): {dt:.3f}")
    if 'rgbs' in sample:
        gt = sample['rgbs'].reshape(h, w, 3)
        print(f"PSNR: {float(psnr_fn(jnp.asarray(img_pred), jnp.asarray(gt))):.2f}")
    return dt


if __name__ == "__main__":
    main()
