#!/usr/bin/env python
"""Render a test split (or synthetic camera path) from a trained checkpoint.

CLI parity: reference eval.py:20-55 — same flags plus TPU additions at the
end. Writes per-frame PNGs, an animated GIF, optional PFM/raw depth, and
prints the mean PSNR when ground truth exists.

The reference's chunked batched_inference (eval.py:58-86, with test_time=True
so the coarse pass is sigma-only) becomes one jitted sharded renderer
(Trainer.render_fn) tiling fixed-size ray blocks across the mesh.
"""
import os
import time
from argparse import ArgumentParser

import numpy as np


def get_opts(argv=None):
    parser = ArgumentParser()
    parser.add_argument('--root_dir', type=str, required=True,
                        help='path to the scene data directory')
    parser.add_argument('--dataset_name', type=str, default='blender',
                        choices=['blender', 'llff'],
                        help='dataset family (blender or llff)')
    parser.add_argument('--scene_name', type=str, default='test',
                        help='output folder name for this scene')
    parser.add_argument('--split', type=str, default='test',
                        help='split to render: test (novel path), '
                             'test_train (training poses), or val '
                             '(held-out views with ground truth)')
    parser.add_argument('--val_num', type=int, default=1,
                        help='llff --split val: number of distinct '
                             'nearest-center held-out views (must match '
                             'the value used at training time)')
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
    parser.add_argument('--chunk', type=int, default=32 * 1024,
                        help='rays per render tile')
    parser.add_argument('--culled_chunk', type=int, default=None,
                        help='BASE ray tile for the occupancy-culled '
                             'renderer (default: the measured optimum, '
                             'CulledRenderer.DEFAULT_CHUNK=8192 — smaller '
                             'than --chunk because per-bucket tiles pad '
                             'less tail; BENCH_NOTES round-5 base-tile '
                             'sweep)')

    parser.add_argument('--ckpt_path', type=str, required=True,
                        help='trained checkpoint to render from')

    parser.add_argument('--save_depth', default=False, action="store_true",
                        help='also export per-frame depth maps')
    parser.add_argument('--depth_format', type=str, default='pfm',
                        choices=['pfm', 'bytes'],
                        help='depth export format')

    # --- TPU additions ---------------------------------------------------
    parser.add_argument('--num_chips', type=int, default=1,
                        help='chips on the data mesh axis')
    parser.add_argument('--precision', type=str, default='float32',
                        choices=['float32', 'bfloat16'])
    parser.add_argument('--out_dir', type=str, default='results',
                        help='output root directory')
    parser.add_argument('--fused_mlp', default=False, action='store_true',
                        help='use the Pallas fused point-MLP kernel')
    parser.add_argument('--occ_grid', default=False, action='store_true',
                        help='occupancy-grid empty-space skipping (near-'
                             'parity ray culling: analytic background '
                             'substituted on provably-empty rays; grid '
                             'cached next to the checkpoint)')
    parser.add_argument('--occ_threshold', type=float, default=1.0,
                        help='sigma above which a grid cell is occupied')
    parser.add_argument('--occ_mode', type=str, default='sigma',
                        choices=['sigma', 'weight'],
                        help='cell criterion: sigma = raw density '
                             'threshold; weight = visibility-pruned (a '
                             'cell is kept only if some eval ray deposits '
                             'quadrature weight on it — junk density in '
                             'occluded regions stops inflating the '
                             'occupied set)')
    parser.add_argument('--occ_range', nargs='+', type=float, default=None,
                        help='grid world extent: 2 values (symmetric lo hi)'
                             ' or 6 (lox loy loz hix hiy hiz); omit to '
                             'auto-derive from the model + cameras')
    parser.add_argument('--occ_N', type=int, default=128,
                        help='occupancy grid resolution per axis')
    parser.add_argument('--occ_tighten', default=False, action='store_true',
                        help='clip surviving rays to their occupied interval')
    parser.add_argument('--occ_budgets', default=False, action='store_true',
                        help='with --occ_tighten: render short-span rays '
                             'with proportionally fewer samples (per-unit-'
                             'length sample density never drops below the '
                             'dense render)')
    parser.add_argument('--occ_segments', type=int, default=0,
                        help='per-ray occupied-segment mask bits (<=32): '
                             'samples concentrate in occupied segments of '
                             'the tightened interval, skipping interior '
                             'empty gaps; with --occ_budgets, buckets key '
                             'on occupied length instead of span. '
                             '0 = off')
    parser.add_argument('--occ_bucket_fracs', nargs='+', type=float,
                        default=None,
                        help='override the budgeted span-bucket sample '
                             'fractions (ascending, must end at 1.0); '
                             'e.g. 0.125 0.25 0.5 1.0 adds a cheaper '
                             'tier for very sparse rays')
    parser.add_argument('--metrics_out', type=str, default=None,
                        help='write per-view PSNR/SSIM + the full flag set '
                             'as JSON to this path (auditable accuracy '
                             'artifact — a PARITY.md mean can be recomputed '
                             'from this file alone)')
    parser.add_argument('--save_gt', default=False, action='store_true',
                        help='also save ground-truth PNGs (gt_###.png) next '
                             'to predictions for committed pred/GT pairs')
    parser.add_argument('--frames_per_dispatch', type=int, default=4,
                        help='frames rendered per device dispatch: rays of '
                             'N poses are pooled into one program call, '
                             'amortizing per-frame host round-trips (and, '
                             'with --occ_grid, packing survivor tiles '
                             'across frames)')
    from nerf_pl_tpu.utils.compile_cache import DEFAULT_DIR
    parser.add_argument('--compile_cache', type=str, default=DEFAULT_DIR,
                        help='persistent XLA compilation cache directory '
                             "('' disables; JAX_COMPILATION_CACHE_DIR env "
                             'var wins if set)')
    return parser.parse_args(argv)


def save_gif(path, frames, fps=30):
    try:
        import imageio
        imageio.mimsave(path, frames, duration=1000.0 / fps, loop=0)
    except (ImportError, TypeError):
        from PIL import Image
        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(path, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / fps), loop=0)


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from nerf_pl_tpu.datasets import dataset_dict
    from nerf_pl_tpu.datasets.depth_utils import save_pfm
    from nerf_pl_tpu.models import init_nerf_params
    from nerf_pl_tpu.parallel import Trainer, make_mesh
    from nerf_pl_tpu.rendering import ModelConfig, RenderConfig
    from nerf_pl_tpu.training import get_optimizer, loss_dict
    from nerf_pl_tpu.training.checkpoints import load_ckpt
    from nerf_pl_tpu.training.metrics import psnr as psnr_fn
    from nerf_pl_tpu.training.metrics import ssim as ssim_fn
    from nerf_pl_tpu.utils.compile_cache import enable_compile_cache

    args = get_opts(argv)
    enable_compile_cache(args.compile_cache)
    w, h = args.img_wh

    kwargs = {'root_dir': args.root_dir, 'split': args.split,
              'img_wh': tuple(args.img_wh)}
    if args.dataset_name == 'llff':
        kwargs['spheric_poses'] = args.spheric_poses
        kwargs['val_num'] = args.val_num
    dataset = dataset_dict[args.dataset_name](**kwargs)

    mcfg = ModelConfig()
    kc, kf = jax.random.split(jax.random.PRNGKey(0))
    params = {"nerf_coarse": init_nerf_params(kc, mcfg.nerf),
              "nerf_fine": init_nerf_params(kf, mcfg.nerf)}
    params = load_ckpt(params, args.ckpt_path, "nerf_coarse")
    if args.N_importance > 0:
        # A coarse-only checkpoint has no nerf_fine leaves; load_ckpt raises
        # on the empty match rather than silently rendering from random fine
        # weights (reference loads fine only when N_importance>0 too,
        # eval.py:107-110).
        params = load_ckpt(params, args.ckpt_path, "nerf_fine")

    compute_dtype = (jnp.bfloat16 if args.precision == "bfloat16"
                     else jnp.float32)
    rcfg = RenderConfig(
        N_samples=args.N_samples, N_importance=args.N_importance,
        use_disp=args.use_disp, perturb=0.0, noise_std=0.0,
        white_back=dataset.white_back, test_time=True,
        compute_dtype=compute_dtype, fused=args.fused_mlp)

    mesh = make_mesh(num_data=min(args.num_chips, len(jax.devices())))
    params = jax.device_put(
        params, jax.sharding.NamedSharding(mesh,
                                           jax.sharding.PartitionSpec()))
    if args.occ_grid:
        from nerf_pl_tpu.rendering import (CulledRenderer, load_or_build_grid,
                                           rays_aabb)
        # AABB of the viewing volume from a few poses (probe box for
        # auto-derived grid ranges)
        aabb_rays = np.concatenate(
            [dataset[i]['rays'] for i in
             range(0, len(dataset), max(1, len(dataset) // 8))], 0)
        vis_rays = None
        if args.occ_mode == "weight":
            # visibility set = the poses about to be rendered (a cell is
            # culled only if NO eval ray can visibly reach it): up to 32
            # poses, strided down inside the builder
            vis_rays = np.concatenate(
                [dataset[i]['rays'] for i in
                 range(0, len(dataset), max(1, len(dataset) // 32))], 0)
        occ = load_or_build_grid(
            args.ckpt_path,
            params["nerf_fine" if args.N_importance > 0 else "nerf_coarse"],
            mcfg, N=args.occ_N, occ_range=args.occ_range,
            sigma_threshold=args.occ_threshold, aabb=rays_aabb(aabb_rays),
            mode=args.occ_mode, vis_rays=vis_rays)
        print(f"[occ] {occ.n_boxes} boxes, "
              f"{occ.occupied_fraction * 100:.1f}% blocks occupied")
        # default base tile: the measured optimum, but never above --chunk
        # (a user bounding working-set memory with --chunk keeps that bound
        # on the culled path too); 0 is rejected by CulledRenderer, not
        # silently coerced to the default.
        cr = CulledRenderer(occ, rcfg, mcfg,
                            chunk=(args.culled_chunk
                                   if args.culled_chunk is not None else
                                   min(args.chunk,
                                       CulledRenderer.DEFAULT_CHUNK)),
                            tighten=(args.occ_tighten or args.occ_budgets
                                     or args.occ_segments > 0),
                            budgets=args.occ_budgets, mesh=mesh,
                            segments=args.occ_segments,
                            bucket_fracs=(tuple(args.occ_bucket_fracs)
                                          if args.occ_bucket_fracs else None))

        def render(params, rays):
            out = cr(params, jnp.asarray(rays))
            return {k: np.asarray(v) for k, v in out.items()}
    else:
        # Trainer only used as the sharded-render host here.
        tr = Trainer(mesh, mcfg, rcfg, get_optimizer("adam", 1e-3),
                     lambda s: 1e-3, loss_dict["mse"], mesh.shape["data"])
        render = tr.render_fn(rcfg, chunk=args.chunk)

    typ = "fine" if args.N_importance > 0 else "coarse"
    dir_name = os.path.join(args.out_dir, args.dataset_name, args.scene_name)
    os.makedirs(dir_name, exist_ok=True)

    imgs, psnrs, ssims, view_ids = [], [], [], []
    px = h * w
    fpd = max(1, args.frames_per_dispatch)
    render_time = 0.0
    for start in range(0, len(dataset), fpd):
        idxs = list(range(start, min(start + fpd, len(dataset))))
        samples = [dataset[i] for i in idxs]
        rays_all = np.concatenate([s['rays'] for s in samples], 0)
        # pad the tail group to a full dispatch so every group compiles to
        # the same program (padded frames rendered then dropped)
        n_pad_frames = fpd - len(idxs) if start else 0
        if n_pad_frames:
            rays_all = np.concatenate(
                [rays_all] + [samples[-1]['rays']] * n_pad_frames, 0)
        t0 = time.perf_counter()
        results = render(params, rays_all)
        render_time += time.perf_counter() - t0

        for j, (i, sample) in enumerate(zip(idxs, samples)):
            img_pred = results[f'rgb_{typ}'][j * px:(j + 1) * px] \
                .reshape(h, w, 3)
            if args.save_depth:
                depth_pred = np.nan_to_num(
                    results[f'depth_{typ}'][j * px:(j + 1) * px]
                    .reshape(h, w))
                if args.depth_format == 'pfm':
                    save_pfm(os.path.join(dir_name, f'depth_{i:03d}.pfm'),
                             depth_pred.astype(np.float32))
                else:
                    with open(os.path.join(dir_name, f'depth_{i:03d}'),
                              'wb') as f:
                        f.write(depth_pred.tobytes())

            img_pred_ = (np.clip(img_pred, 0, 1) * 255).astype(np.uint8)
            imgs.append(img_pred_)
            Image.fromarray(img_pred_).save(
                os.path.join(dir_name, f'{i:03d}.png'))

            if 'rgbs' in sample:
                gt = np.asarray(sample['rgbs']).reshape(h, w, 3)
                view_ids.append(i)
                psnrs.append(float(psnr_fn(
                    jnp.asarray(img_pred), jnp.asarray(gt))))
                ssims.append(float(ssim_fn(
                    jnp.asarray(img_pred.transpose(2, 0, 1)),
                    jnp.asarray(gt.transpose(2, 0, 1)))))
                if args.save_gt:
                    Image.fromarray(
                        (np.clip(gt, 0, 1) * 255).astype(np.uint8)).save(
                        os.path.join(dir_name, f'gt_{i:03d}.png'))
        print(f"[eval] frame {idxs[-1] + 1}/{len(dataset)}", flush=True)

    save_gif(os.path.join(dir_name, f'{args.scene_name}.gif'), imgs, fps=30)

    n_f = len(dataset)
    print(f"[eval] {n_f} frames rendered in {render_time:.1f} s "
          f"({render_time / max(n_f, 1):.2f} s/frame incl. first-dispatch "
          f"compile; {60 * n_f / max(render_time, 1e-9):.1f} frames/min)")
    if psnrs:
        print(f'Mean PSNR : {np.mean(psnrs):.2f}')
        print(f'Mean SSIM : {np.mean(ssims):.4f}')
    if args.metrics_out:
        import json
        os.makedirs(os.path.dirname(os.path.abspath(args.metrics_out)),
                    exist_ok=True)
        payload = {
            "flags": {k: v for k, v in sorted(vars(args).items())},
            "n_views": n_f,
            "per_view": [{"view": v, "psnr": round(p, 4),
                          "ssim": round(s, 6)}
                         for v, p, s in zip(view_ids, psnrs, ssims)],
            "mean_psnr": round(float(np.mean(psnrs)), 4) if psnrs else None,
            "min_psnr": round(float(np.min(psnrs)), 4) if psnrs else None,
            "mean_ssim": round(float(np.mean(ssims)), 6) if ssims else None,
            "render_secs_total": round(render_time, 2),
        }
        with open(args.metrics_out, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"[eval] metrics written to {args.metrics_out}")
    return np.mean(psnrs) if psnrs else None


if __name__ == "__main__":
    main()
