"""SPMD training & rendering over a device mesh.

This module replaces the reference's execution runtime (pytorch-lightning
Trainer + DDP + DataLoader workers, SURVEY.md L4/C22-C23) with a TPU-native
design:

  * The entire ray store (every ray of every training image) lives in device
    HBM, sharded over the `data` mesh axis. Batch sampling is a per-device
    random gather *inside* the jitted step (shard_map) — zero host->device
    traffic per step, no worker processes, no sampler state to shard.
  * `run_steps` fuses K optimizer steps into one `lax.scan`d XLA program:
    the host only dispatches once per segment and reads back (K,) metric
    arrays. Dispatch overhead amortizes to ~zero.
  * Gradients are reduced by XLA: the loss is a mean over the globally
    sharded batch, so GSPMD inserts the AllReduce over ICI (no NCCL, no
    explicit pmean).
  * Optional tensor parallelism over a `model` axis comes entirely from
    parameter PartitionSpecs (mesh.py); GSPMD threads the collectives.
  * Full-image rendering tiles rays as (devices, tiles_per_device, chunk):
    devices work data-parallel, each lax.map's sequentially over its tiles
    to bound memory — the TPU-native form of the reference's chunk loop
    (train.py:49-71).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.nerf import init_nerf_params
from ..rendering.render import (ModelConfig, RenderConfig,
                                fused_mse_train_step, render_rays)
from .mesh import model_pspecs


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class Trainer:
    """Builds and caches the jitted SPMD train/render programs.

    Args:
      mesh: a (data, model) Mesh from parallel.mesh.make_mesh.
      mcfg: static model config.
      rcfg_train: static render config for training steps.
      optimizer: an optax GradientTransformation.
      lr_schedule: step -> lr (logged alongside metrics).
      loss_fn: results dict, rgbs -> scalar.
      batch_size: GLOBAL batch size (split across the data axis).
      tensor_parallel: shard the MLP over the 'model' axis.
    """

    def __init__(self, mesh, mcfg: ModelConfig, rcfg_train: RenderConfig,
                 optimizer: optax.GradientTransformation,
                 lr_schedule: Callable,
                 loss_fn: Callable,
                 batch_size: int,
                 tensor_parallel: bool = False):
        self.mesh = mesh
        self.mcfg = mcfg
        self.rcfg_train = rcfg_train
        self.optimizer = optimizer
        self.lr_schedule = lr_schedule
        self.loss_fn = loss_fn
        self.n_data = mesh.shape["data"]
        assert batch_size % self.n_data == 0, (
            f"global batch {batch_size} not divisible by data axis "
            f"{self.n_data}")
        self.batch_size = batch_size
        self.batch_local = batch_size // self.n_data
        self.tensor_parallel = tensor_parallel
        self.all_rays = None
        self.all_rgbs = None
        self._run_steps = None
        self._reshuffle = None
        self._render_cache: Dict[Any, Callable] = {}

    # ---------------------------------------------------------------- data
    def set_data(self, all_rays: np.ndarray, all_rgbs: np.ndarray,
                 shuffle_seed: int = 0):
        """Ship the full ray store to HBM, sharded over the data axis.

        The store is globally shuffled ONCE on the host: batch sampling then
        reads a contiguous block at a random offset (a contiguous block of a
        permutation is a uniform without-replacement sample), which is a
        sequential DMA instead of a 1024-row random gather from a ~GB HBM
        table (the gather costs ~10 ms/step at lego scale).

        Pads to a multiple of the GLOBAL batch by repeating head rays, so
        every local shard is a whole number of local batches: no tail rays
        are silently dropped (the reference DataLoader default is
        drop_last=False) and steps_per_epoch_local always agrees with the
        system-level ceil(n / batch) epoch length."""
        n = all_rays.shape[0]
        perm = np.random.default_rng(shuffle_seed).permutation(n)
        all_rays = all_rays[perm]
        all_rgbs = all_rgbs[perm]
        pad = (-n) % max(self.batch_size, self.n_data)
        if pad:
            all_rays = np.concatenate([all_rays, all_rays[:pad]], 0)
            all_rgbs = np.concatenate([all_rgbs, all_rgbs[:pad]], 0)
        sh = NamedSharding(self.mesh, P("data"))
        self.all_rays = jax.device_put(all_rays, sh)
        self.all_rgbs = jax.device_put(all_rgbs, sh)
        # Original [near, far] of every ray, kept so occupancy tightening
        # (tighten_store) stays idempotent: re-tightening with a fresh grid
        # always derives from the ORIGINAL interval, never from a previously
        # shrunk one. Materialized lazily on first tighten.
        self.all_nf0 = None
        # Per-ray occupied-segment bitmask ((R,) uint32) + its static
        # segment count; set by tighten_store(n_seg > 0).
        self.all_occm = None
        self.occ_n_seg = 0
        self.n_rays_local = all_rays.shape[0] // self.n_data
        # steps covering one pass over a local shard (DataLoader-epoch analog)
        self.steps_per_epoch_local = max(1, self.n_rays_local
                                         // self.batch_local)

    def reshuffle(self, key: jax.Array):
        """Per-epoch reshuffle: physically re-permute each device's shard.

        The reference reshuffles rays every epoch via DataLoader(shuffle=True)
        (train.py:89-94). Here each device applies a fresh
        `jax.random.permutation` to its local shard in HBM — one gather per
        epoch instead of one per step, so per-step sampling stays a
        sequential DMA. Shards never exchange rays (the initial global host
        shuffle in set_data already mixed images across devices), matching
        torch DistributedSampler's per-rank semantics."""
        extras = [a for a in (self.all_nf0, self.all_occm) if a is not None]
        n_arrays = 2 + len(extras)
        if self._reshuffle is None or self._reshuffle[0] != n_arrays:
            def local(key, *arrays):
                key = jax.random.fold_in(key, jax.lax.axis_index("data"))
                perm = jax.random.permutation(key, arrays[0].shape[0])
                return tuple(jnp.take(a, perm, axis=0) for a in arrays)

            smapped = jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(P(),) + (P("data"),) * n_arrays,
                out_specs=(P("data"),) * n_arrays,
                check_vma=False)
            self._reshuffle = (n_arrays, jax.jit(
                smapped, donate_argnums=tuple(range(1, n_arrays + 1))))
        out = self._reshuffle[1](key, self.all_rays, self.all_rgbs, *extras)
        self.all_rays, self.all_rgbs = out[0], out[1]
        i = 2
        if self.all_nf0 is not None:
            self.all_nf0 = out[i]
            i += 1
        if self.all_occm is not None:
            self.all_occm = out[i]

    def tighten_store(self, boxes: np.ndarray, margin: float = 0.1,
                      n_seg: int = 0):
        """Occupancy-tighten the [near, far] of EVERY ray in the store.

        The training-side form of empty-space skipping (NerfAcc-style, but
        amortized): instead of culling samples inside the step — impossible
        with static shapes — each ray's sampling interval is clipped once
        per grid refresh to the union of its occupancy-box overlaps
        (rendering/occupancy.py ray_box_hits), so ALL N_samples land in
        (near-)occupied space. Rays that miss every box keep their original
        interval (they still supervise the background). Idempotent: always
        derives from the original [near, far] captured on first call.

        n_seg > 0 additionally computes a per-ray occupied-segment bitmask
        over the tightened interval (ray_box_segment_bits) and stores it in
        ``all_occm``; the train step then places coarse samples by inverse
        CDF over occupied segments only (render.py occupied_z_vals),
        skipping interior empty gaps that the single union interval cannot
        express (e.g. ground-plane-to-object gaps on wide scenes).

        Returns (hit_fraction, mean_shrink) read back for logging.
        """
        from ..rendering.occupancy import (ray_box_hits,
                                           ray_box_segment_bits)
        if self.all_nf0 is None:
            self.all_nf0 = jnp.array(self.all_rays[:, 6:8])  # copy, sharded
        boxes = jnp.asarray(boxes, jnp.float32)

        def local(rays_l, nf0_l, bxs):
            base = jnp.concatenate([rays_l[:, :6], nf0_l], axis=1)
            hit, tlo, thi = ray_box_hits(bxs, base)
            near0, far0 = nf0_l[:, 0], nf0_l[:, 1]
            near = jnp.where(hit, jnp.maximum(near0, tlo - margin), near0)
            far = jnp.where(hit, jnp.minimum(far0, thi + margin), far0)
            far = jnp.maximum(far, near + 1e-4)
            new = jnp.concatenate(
                [rays_l[:, :6], near[:, None], far[:, None]], axis=1)
            n_hit = jnp.sum(hit.astype(jnp.float32))
            shrink = jnp.sum(1.0 - (far - near) / (far0 - near0))
            outs = (new, jax.lax.psum(n_hit, "data"),
                    jax.lax.psum(shrink, "data"))
            if n_seg > 0:
                outs += (ray_box_segment_bits(bxs, new, n_seg),)
            return outs

        cache_key = (int(boxes.shape[0]), float(margin), int(n_seg))
        if getattr(self, "_tighten_cache", None) is None:
            self._tighten_cache = {}
        if cache_key not in self._tighten_cache:
            extra = (P("data"),) if n_seg > 0 else ()
            smapped = jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(P("data"), P("data"), P()),
                out_specs=(P("data"), P(), P()) + extra,
                check_vma=False)
            self._tighten_cache[cache_key] = jax.jit(smapped,
                                                     donate_argnums=(0,))
        out = self._tighten_cache[cache_key](
            self.all_rays, self.all_nf0, boxes)
        self.all_rays, n_hit, shrink = out[0], out[1], out[2]
        if n_seg > 0:
            self.all_occm = out[3]
            self.occ_n_seg = n_seg
        n = self.all_nf0.shape[0]
        return float(n_hit) / n, float(shrink) / n

    # --------------------------------------------------------------- state
    def init_state(self, key: jax.Array,
                   init_params: Optional[Any] = None) -> TrainState:
        """Initialize (or adopt) params + optimizer state with mesh placement."""
        if init_params is None:
            kc, kf = jax.random.split(key)
            init_params = {"nerf_coarse": init_nerf_params(kc, self.mcfg.nerf)}
            if self.rcfg_train.N_importance > 0:
                init_params["nerf_fine"] = init_nerf_params(kf, self.mcfg.nerf)
        pspecs = model_pspecs(init_params, self.mesh.shape["model"],
                              self.tensor_parallel)
        shardings = jax.tree_util.tree_map(
            lambda spec: NamedSharding(self.mesh, spec), pspecs,
            is_leaf=lambda x: isinstance(x, P))
        params = jax.device_put(init_params, shardings)
        # optimizer.init under jit: moment buffers inherit param shardings.
        opt_state = jax.jit(self.optimizer.init)(params)
        step = jax.device_put(jnp.zeros([], jnp.int32),
                              NamedSharding(self.mesh, P()))
        return TrainState(params, opt_state, step)

    # --------------------------------------------------------------- train
    def _sample_batch(self, all_rays, all_rgbs, step: jnp.ndarray,
                      all_occm=None):
        """Per-device sequential epoch-order read from the local shard.

        Step i of an epoch reads block [i*b, (i+1)*b) of the (per-epoch
        re-permuted, see `reshuffle`) local shard — every ray is visited
        exactly once per pass, matching DataLoader(shuffle=True) epoch
        semantics (reference train.py:89-94), and the read is a sequential
        DMA, not a random gather.

        NOTE: the ray store MUST flow in as a traced argument — a closure
        capture would embed the whole store as an HLO constant (hundreds of
        MB for real scenes), exploding compile time."""
        b_local = self.batch_local
        spe = self.steps_per_epoch_local
        has_occm = all_occm is not None

        def local(rays_l, rgbs_l, step, occm_l=None):
            off = (step % spe) * b_local
            rays = jax.lax.dynamic_slice(rays_l, (off, 0), (b_local, 8))
            rgbs = jax.lax.dynamic_slice(rgbs_l, (off, 0), (b_local, 3))
            if occm_l is None:
                return rays, rgbs
            occm = jax.lax.dynamic_slice(occm_l, (off,), (b_local,))
            return rays, rgbs, occm

        extra = (P("data"),) if has_occm else ()
        smapped = jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P("data"), P("data"), P()) + extra,
            out_specs=(P("data"), P("data")) + extra,
            check_vma=False)
        if has_occm:
            return smapped(all_rays, all_rgbs, step, all_occm)
        return smapped(all_rays, all_rgbs, step)

    def _loss_and_grads(self, params, rays, rgbs, key, occm=None):
        """(loss, render-out, grads) — jax.grad over render_rays, or the
        loss-fused single-kernel path under an explicit shard_map."""
        n_seg = self.occ_n_seg if occm is not None else 0
        if not self.rcfg_train.fused_loss:
            def loss_of(p):
                out = render_rays(p, rays, key, self.rcfg_train, self.mcfg,
                                  occm=occm, n_seg=n_seg)
                return self.loss_fn(out, rgbs), out

            (loss, out), grads = jax.value_and_grad(
                loss_of, has_aux=True)(params)
            typ = "fine" if "rgb_fine" in out else "coarse"
            mse = jnp.mean((out[f"rgb_{typ}"] - rgbs) ** 2)
            return loss, mse, grads

        # Loss-fused path: gradients come straight out of the kernels.
        # shard_map makes the data-parallel reduction explicit (psum over
        # ICI) instead of leaning on GSPMD's handling of the opaque Pallas
        # custom-calls.
        assert not self.tensor_parallel, (
            "fused_loss path shards rays only (the 0.6M-param MLP needs no "
            "tensor parallelism); run with tensor_parallel=False")
        rcfg, mcfg, gbatch = self.rcfg_train, self.mcfg, self.batch_size

        def local(params, rays_l, rgbs_l, key, occm_l=None):
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))
            loss_sum, out, grads = fused_mse_train_step(
                params, rays_l, rgbs_l, key, rcfg, gbatch, mcfg,
                occm=occm_l, n_seg=n_seg)
            typ = "fine" if "rgb_fine" in out else "coarse"
            sq = jnp.sum((out[f"rgb_{typ}"] - rgbs_l) ** 2)
            loss = jax.lax.psum(loss_sum, "data") / gbatch
            mse = jax.lax.psum(sq, "data") / (gbatch * 3)
            grads = jax.lax.psum(grads, "data")
            return loss, mse, grads

        extra = (P("data"),) if occm is not None else ()
        smapped = jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P(), P("data"), P("data"), P()) + extra,
            out_specs=(P(), P(), P()),
            check_vma=False)
        if occm is not None:
            return smapped(params, rays, rgbs, key, occm)
        return smapped(params, rays, rgbs, key)

    def _one_step(self, state: TrainState, all_rays, all_rgbs, all_occm,
                  key: jax.Array):
        if all_occm is None:
            rays, rgbs = self._sample_batch(all_rays, all_rgbs, state.step)
            occm = None
        else:
            rays, rgbs, occm = self._sample_batch(all_rays, all_rgbs,
                                                  state.step, all_occm)
        loss, mse, grads = self._loss_and_grads(state.params, rays, rgbs,
                                                key, occm=occm)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        psnr = -10.0 * jnp.log10(mse)
        metrics = {"loss": loss, "psnr": psnr,
                   "lr": self.lr_schedule(state.step)}
        return TrainState(params, opt_state, state.step + 1), metrics

    def run_steps(self, state: TrainState, key: jax.Array,
                  n_steps: int) -> Tuple[TrainState, Dict[str, np.ndarray]]:
        """Run n_steps fused optimizer steps on device; returns (K,) metrics.

        The per-step PRNG key is fold_in(key, global_step), so restarts and
        segment boundaries do not change the random stream."""
        if self._run_steps is None:
            # all_occm is None until the first tighten_store(n_seg>0);
            # jit retraces on the None -> array structure change (one
            # recompile at occupancy activation, not per segment).
            @functools.partial(jax.jit, static_argnames=("n_steps",),
                               donate_argnums=(0,))
            def _run(state, all_rays, all_rgbs, all_occm, key, n_steps):
                def body(st, _):
                    k = jax.random.fold_in(key, st.step)
                    return self._one_step(st, all_rays, all_rgbs, all_occm,
                                          k)
                return jax.lax.scan(body, state, None, length=n_steps)
            self._run_steps = _run
        state, metrics = self._run_steps(state, self.all_rays, self.all_rgbs,
                                         self.all_occm, key, n_steps)
        return state, metrics

    # -------------------------------------------------------------- render
    def render_fn(self, rcfg: RenderConfig, chunk: int) -> Callable:
        """Jitted sharded full-image renderer for a given static config.

        Input rays are padded+tiled to (n_data * T, chunk, 8); each device
        lax.map's over its T tiles. Cached per (rcfg, chunk)."""
        cache_key = (rcfg, chunk)
        if cache_key in self._render_cache:
            return self._render_cache[cache_key]

        mcfg = self.mcfg

        def local(params, tiles, key):
            # tiles: (T, chunk, 8) on this device
            return jax.lax.map(
                lambda r: render_rays(params, r, key, rcfg, mcfg), tiles)

        smapped = jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P(), P("data"), P()),
            out_specs=P("data"),
            check_vma=False,
        )

        jitted = jax.jit(smapped)

        def render(params, rays: np.ndarray, key=None):
            if key is None:
                key = jax.random.PRNGKey(0)
            R = rays.shape[0]
            granularity = self.n_data * chunk
            pad = (-R) % granularity
            rays_p = np.concatenate(
                [rays, np.zeros((pad, 8), rays.dtype)], 0) if pad else rays
            # pad rows: keep near<far to avoid degenerate z ranges
            if pad:
                rays_p[R:, 6] = 0.0
                rays_p[R:, 7] = 1.0
            tiles = rays_p.reshape(-1, chunk, 8)
            out = jitted(params, tiles, key)
            return {k: np.asarray(v.reshape((-1,) + v.shape[2:])[:R])
                    for k, v in out.items()}

        self._render_cache[cache_key] = render
        return render
