#!/usr/bin/env python
"""Microbenchmark the fused inference kernels across ray-tile sizes.

The round-1 inference kernels were sized against Mosaic's 16 MB default
scoped-VMEM budget (points_per_tile=1024 -> 8-ray tiles at S=128, i.e. an
80k-step grid per 800x800 frame). With the 100 MB budget unlocked in round
2 for the training kernels, larger inference tiles amortize per-grid-step
overhead and keep the MXU busy. This script measures points/s for
fused_render_eval (full MLP) and fused_sigma_render (sigma-only trunk) at
several tile sizes, with iteration-varying inputs (the axon relay dedupes
identical (program, args) executions — see BENCH_NOTES.md).

    python scripts/bench_kernels.py [--n_rays 163840] [--s 128]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(fn, args_list):
    """Best-of over per-call timings with distinct inputs (dedupe-safe);
    host-transfers one output element to close each timing."""
    dts = []
    for a in args_list:
        t0 = time.perf_counter()
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[:1])
        dts.append(time.perf_counter() - t0)
    return min(dts), sorted(dts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_rays", type=int, default=163840)
    ap.add_argument("--s", type=int, default=128)
    ap.add_argument("--tiles", type=int, nargs="+",
                    default=[1024, 4096, 8192, 16384, 32768])
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from nerf_pl_tpu.models import init_nerf_params
    from nerf_pl_tpu.ops.fused_render import (fused_render_eval,
                                              fused_sigma_render)
    from nerf_pl_tpu.rendering import ModelConfig

    mcfg = ModelConfig()
    params = init_nerf_params(jax.random.PRNGKey(0), mcfg.nerf)
    R, S = args.n_rays, args.s
    rng = np.random.default_rng(0)

    def make_inputs(seed):
        r = np.random.default_rng(seed)
        o = r.normal(size=(R, 3)).astype(np.float32)
        d = r.normal(size=(R, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = np.concatenate(
            [o, d, np.full((R, 1), 2.0, np.float32),
             np.full((R, 1), 6.0, np.float32)], 1)
        z = np.sort(r.uniform(2.0, 6.0, (R, S)).astype(np.float32), -1)
        return jnp.asarray(rays), jnp.asarray(z)

    inputs = [make_inputs(i) for i in range(args.reps)]

    for ppt in args.tiles:
        fn = jax.jit(lambda r, z, p=ppt: fused_render_eval(
            params, r, z, white_back=True, points_per_tile=p))
        try:
            fn(*inputs[0])  # compile
            best, spread = time_fn(fn, inputs)
        except Exception as e:  # VMEM-infeasible tiles fail at compile
            print(f"full ppt={ppt:6d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")
            continue
        pts = R * S
        print(f"full ppt={ppt:6d}: {best*1e3:8.2f} ms  "
              f"{pts/best/1e6:7.1f} Mpts/s  "
              f"spread={['%.1f' % (d*1e3) for d in spread]}", flush=True)

    for ppt in args.tiles:
        fn = jax.jit(lambda r, z, p=ppt: fused_sigma_render(
            params, r, z, points_per_tile=p))
        try:
            fn(*inputs[0])
            best, spread = time_fn(fn, inputs)
        except Exception as e:
            print(f"sig  ppt={ppt:6d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")
            continue
        pts = R * S
        print(f"sig  ppt={ppt:6d}: {best*1e3:8.2f} ms  "
              f"{pts/best/1e6:7.1f} Mpts/s  "
              f"spread={['%.1f' % (d*1e3) for d in spread]}", flush=True)


if __name__ == "__main__":
    main()
