#!/usr/bin/env python
"""Benchmark: steady-state training throughput on the flagship config.

Measures rays/sec/chip for the headline Blender recipe (batch 1024,
N_importance 64 fine, full 8x256 MLPs, perturb + sigma noise) — the
per-step work of the reference's lego benchmark (README.md:136-142:
0.12 s/step at batch 1024 on an RTX 2080 Ti, i.e. 8,533 rays/s, the
vs_baseline denominator). The default config is the culled32 recipe
(32 coarse samples placed in occupied segments instead of 64 uniform):
both culled recipes are accuracy-gated ABOVE dense on the 25-view
hard400 test split — culled32 34.49 dB / culled48 34.64 dB vs dense
33.89 dB (docs/parity/hard400_{c32,c48}) — so the speedup is free;
culled48 trades ~18% throughput for the highest accuracy. `--config
dense` benches the uniform-sampling step for like-for-like comparison
with rounds 1-3.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import jax
import numpy as np

REFERENCE_RAYS_PER_SEC = 1024 / 0.12  # nerf_pl on RTX 2080 Ti


def main():
    import argparse

    from nerf_pl_tpu.parallel import Trainer, make_mesh
    from nerf_pl_tpu.rendering import ModelConfig, RenderConfig
    from nerf_pl_tpu.training import get_lr_schedule, get_optimizer, loss_dict

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="culled32",
                    choices=["dense", "culled48", "culled32"],
                    help="dense = reference flagship (64+64). culledN = "
                         "occupancy-tightened training step (N coarse "
                         "samples placed in occupied segments + 64 fine). "
                         "Both culled recipes are accuracy-gated ABOVE "
                         "dense on the 25-view hard400 test split "
                         "(culled32 34.49 / culled48 34.64 vs dense "
                         "33.89 dB, docs/parity/hard400_{c32,c48}); "
                         "culled32 (default) is 1.44x dense step "
                         "throughput, culled48 1.18x at peak accuracy")
    ap.add_argument("--precision", default="float32",
                    choices=["float32", "bfloat16"],
                    help="master-weight/moment dtype (kernels compute bf16 "
                         "matmuls either way); A/B knob for BENCH_NOTES")
    args = ap.parse_args()
    from nerf_pl_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()  # warm processes skip the remote compile
    culled = args.config.startswith("culled")
    n_coarse = 64 if not culled else int(args.config[len("culled"):])

    batch = 1024
    mesh = make_mesh(num_data=1)
    rcfg = RenderConfig(N_samples=n_coarse, N_importance=64, perturb=1.0,
                        noise_std=1.0, white_back=True, fused_train=True,
                        fused_loss=True)
    sched = get_lr_schedule("steplr", 5e-4, 16, 1000, decay_step=[2, 4, 8],
                            decay_gamma=0.5)
    opt = get_optimizer("adam", sched)
    tr = Trainer(mesh, ModelConfig(), rcfg, opt, sched, loss_dict["mse"],
                 batch)

    # synthetic ray store shaped like lego 400x400 (content doesn't matter
    # for speed: the compute is shape-static)
    rng = np.random.default_rng(0)
    n = 100 * 400 * 400
    o = rng.normal(size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, d, np.full((n, 1), 2.0, np.float32),
         np.full((n, 1), 6.0, np.float32)], 1)
    rgbs = rng.random((n, 3)).astype(np.float32)
    tr.set_data(rays, rgbs)
    if culled:
        # the occ-tightened step's extra work (interval clip + per-ray
        # occupied-segment sample placement + packed store bookkeeping) is
        # content-independent — synthetic boxes exercise the same program
        boxes = np.asarray([[-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]], np.float32)
        st = tr.tighten_store(boxes, margin=0.1, n_seg=32, dilate=1,
                              pack=True)
        print(f"[bench] culled store: hit {st['hit_frac']:.2f}, "
              f"shrink {st['shrink']:.2f}, expand x{st['expand']:.2f}",
              file=sys.stderr)

    import jax.numpy as jnp
    master = jnp.bfloat16 if args.precision == "bfloat16" else None
    state = tr.init_state(jax.random.PRNGKey(0), master_dtype=master)

    # Compile + warmup with the SAME segment length as the timed run (the
    # jitted program is cached per static scan length). NOTE: do not enable
    # jax's persistent compilation cache here — it deadlocks against this
    # machine's remote-compile tunnel.
    steps = 400
    state, _ = tr.run_steps(state, jax.random.PRNGKey(1), steps)
    jax.block_until_ready(state.params)

    # Timed segments, best-of (the shared chip's throughput drifts 2-3x
    # run-to-run with tenancy; best-of reduces tenancy noise without hiding
    # steady-state cost — all segments run the identical cached program).
    # The full spread is reported on stderr for honesty.
    dts = []
    losses = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, m = tr.run_steps(state, jax.random.PRNGKey(1), steps)
        # Sync on a PARAM leaf (the optimizer update is not in the loss
        # metric's dependency chain, so syncing on loss alone would let
        # trailing update work leak past the timer). np.asarray forces a
        # host transfer — block_until_ready is unreliable over this tunnel.
        np.asarray(jax.tree_util.tree_leaves(state.params)[0])
        dts.append(time.perf_counter() - t0)
        losses.append(np.asarray(m["loss"]))
    assert all(np.all(np.isfinite(l)) for l in losses)

    rays_per_sec = steps * batch / min(dts)
    spread = [round(steps * batch / dt, 1) for dt in sorted(dts)]
    print(f"[bench] config={args.config} segment spread (rays/s): {spread}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
