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
        self._reshuffle_packed = None
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
            # modular tiling: pad can exceed n for stores smaller than the
            # global batch (all_rays[:pad] would then under-pad and the
            # per-device dynamic_slice would be out of bounds)
            idx = np.arange(pad) % n
            all_rays = np.concatenate([all_rays, all_rays[idx]], 0)
            all_rgbs = np.concatenate([all_rgbs, all_rgbs[idx]], 0)
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
        # Survivor packing (tighten_store(pack=True)): per-ray hit flag,
        # stable identity label, and per-device survivor counts. When
        # active, each shard is kept survivors-first and the sampler reads
        # batches from the survivor region only — rays that miss every
        # occupancy box (analytic background, zero gradient) stop consuming
        # step compute. `pack_expand` is the resulting effective-throughput
        # multiplier (total rays / surviving rays).
        self.all_hit = None
        self.all_nsurv = None
        self.pack_expand = 1.0
        self.n_rays_local = all_rays.shape[0] // self.n_data
        # Stable per-ray identity labels (canonical reshuffle + packing):
        # assigned once here, after the deterministic host shuffle, and
        # carried through every subsequent permutation in lockstep.
        self.all_idx = self._make_idx()
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
        torch DistributedSampler's per-rank semantics.

        With survivor packing active (tighten_store(pack=True)) the shuffle
        is CANONICAL instead of incremental: rows are ordered by
        (miss-flag, u(key, identity)) where u hashes each ray's stable
        identity label with the epoch key. The resulting array content is a
        pure function of (hit, key, identity set) — independent of the
        store's current order — so a resumed run only needs the LAST epoch
        key (plus the re-derived grid) to reproduce the live layout,
        and survivors always stay packed in front."""
        if self.all_hit is not None:
            self._reshuffle_canonical(key)
            return
        extras_named = [(n, a) for n, a in
                        (("all_nf0", self.all_nf0),
                         ("all_occm", self.all_occm),
                         ("all_idx", self.all_idx)) if a is not None]
        extras = [a for _, a in extras_named]
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
        for (name, _), arr in zip(extras_named, out[2:]):
            setattr(self, name, arr)

    def _pack_named(self):
        """(name, array) pairs that must stay row-aligned under packing."""
        named = [("all_rays", self.all_rays), ("all_rgbs", self.all_rgbs),
                 ("all_nf0", self.all_nf0), ("all_occm", self.all_occm),
                 ("all_hit", self.all_hit), ("all_idx", self.all_idx)]
        return [(n, a) for n, a in named if a is not None]

    def _reshuffle_canonical(self, key: jax.Array):
        """Canonical per-epoch order for the packed store (see reshuffle)."""
        named = self._pack_named()
        names = tuple(n for n, _ in named)
        if (self._reshuffle_packed is None
                or self._reshuffle_packed[0] != names):
            hit_pos = names.index("all_hit")
            idx_pos = names.index("all_idx")

            def local(key, *arrays):
                hit, idx = arrays[hit_pos], arrays[idx_pos]
                u = jax.vmap(
                    lambda i: jax.random.uniform(
                        jax.random.fold_in(key, i)))(idx)
                order = jnp.argsort((1.0 - hit) * 2.0 + u)
                out = tuple(jnp.take(a, order, axis=0) for a in arrays)
                return out + (jnp.sum(hit.astype(jnp.int32))[None],)

            smapped = jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(P(),) + (P("data"),) * len(names),
                out_specs=(P("data"),) * (len(names) + 1),
                check_vma=False)
            self._reshuffle_packed = (names, jax.jit(
                smapped, donate_argnums=tuple(range(1, len(names) + 1))))
        out = self._reshuffle_packed[1](key, *(a for _, a in named))
        for (name, _), arr in zip(named, out[:-1]):
            setattr(self, name, arr)
        self.all_nsurv = out[-1]

    def tighten_store(self, boxes: np.ndarray, margin: float = 0.1,
                      n_seg: int = 0, dilate: int = 0, pack: bool = False):
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

        ``dilate`` widens each occupied segment run by that many segments
        per side. The sample bordering an empty gap then lands in a
        (near-)empty segment whose sigma is free to decay to zero, instead
        of inside the surface — without it, the last in-surface sample's
        sigma serves two masters (model the surface AND not occlude the
        following gap, whose whole length lands in that sample's quadrature
        delta), which biases the trained field away from what a dense
        render integrates.

        ``pack=True`` additionally keeps every device's shard partitioned
        survivors-first and records per-device survivor counts: the batch
        sampler then reads only from the survivor region, so rays that miss
        every box — whose render is analytically the background and whose
        loss gradient is zero under a conservative grid — stop consuming
        step compute (NerfAcc-style ray culling, amortized to one partition
        per grid refresh / epoch). Miss rays still participate: their
        constant loss term is computed here once (returned for logging) and
        they re-enter the compute set whenever a grid refresh flips them.

        Returns a stats dict: hit_frac, shrink, and with pack also
        miss_mse (mean (background - gt)^2 over packed-out rays) and
        expand (total/survivors effective-throughput multiplier).
        """
        from ..rendering.occupancy import (dilate_segment_bits,
                                           ray_box_hits,
                                           ray_box_segment_bits)
        if self.all_nf0 is None:
            self.all_nf0 = jnp.array(self.all_rays[:, 6:8])  # copy, sharded
        # Pad the box count up to a 64-bucket with zero-volume boxes at an
        # unreachable location (t ~ 1e8 >> far, so the slab test never
        # marks them valid). The jitted tighten program is keyed on the box
        # COUNT; without bucketing, every grid refresh (152 -> 167 -> 146
        # boxes...) triggered a fresh ~2 min remote compile — most of the
        # 876 s occ_tighten overhead observed over a 16-epoch run.
        boxes = np.asarray(boxes, np.float32)
        n_pad = -len(boxes) % 64
        if n_pad:
            boxes = np.concatenate(
                [boxes, np.full((n_pad, 6), 1e8, np.float32)], 0)
        boxes = jnp.asarray(boxes)

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
                occm = ray_box_segment_bits(bxs, new, n_seg)
                if dilate > 0:
                    occm = dilate_segment_bits(occm, n_seg, dilate)
                outs += (occm,)
            if pack:
                outs += (hit.astype(jnp.float32),)
            return outs

        cache_key = (int(boxes.shape[0]), float(margin), int(n_seg),
                     int(dilate), bool(pack))
        if getattr(self, "_tighten_cache", None) is None:
            self._tighten_cache = {}
        if cache_key not in self._tighten_cache:
            extra = (P("data"),) * ((n_seg > 0) + bool(pack))
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
        i = 3
        if n_seg > 0:
            self.all_occm = out[i]
            self.occ_n_seg = n_seg
            i += 1
        n = self.all_nf0.shape[0]
        stats = {"hit_frac": float(n_hit) / n, "shrink": float(shrink) / n}
        if pack:
            self.all_hit = out[i]
            stats.update(self._partition_store())
        return stats

    def _make_idx(self):
        """Stable global identity label per stored ray (packing support)."""
        n_local = self.n_rays_local

        def local():
            base = jax.lax.axis_index("data").astype(jnp.int32) * n_local
            return base + jnp.arange(n_local, dtype=jnp.int32)

        return jax.jit(jax.shard_map(
            local, mesh=self.mesh, in_specs=(),
            out_specs=P("data"), check_vma=False))()

    def _partition_store(self):
        """Stable survivors-first partition of every shard + miss stats.

        Stable: preserves the current (shuffled) order within each class,
        so no extra randomness is introduced mid-epoch."""
        named = self._pack_named()
        names = tuple(n for n, _ in named)
        white = self.rcfg_train.white_back
        if (getattr(self, "_partition_cache", None) is None
                or self._partition_cache[0] != names):
            hit_pos = names.index("all_hit")
            rgb_pos = names.index("all_rgbs")

            def local(*arrays):
                hit, rgbs = arrays[hit_pos], arrays[rgb_pos]
                order = jnp.argsort(1.0 - hit)  # stable (jnp default)
                out = tuple(jnp.take(a, order, axis=0) for a in arrays)
                bg = 1.0 if white else 0.0
                sse = jnp.sum(((rgbs - bg) ** 2) * (1.0 - hit)[:, None])
                n_miss = jnp.sum(1.0 - hit)
                return out + (jnp.sum(hit.astype(jnp.int32))[None],
                              jax.lax.psum(sse, "data"),
                              jax.lax.psum(n_miss, "data"))

            smapped = jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(P("data"),) * len(names),
                out_specs=(P("data"),) * (len(names) + 1) + (P(), P()),
                check_vma=False)
            self._partition_cache = (names, jax.jit(
                smapped, donate_argnums=tuple(range(len(names)))))
        out = self._partition_cache[1](*(a for _, a in named))
        for (name, _), arr in zip(named, out[:-3]):
            setattr(self, name, arr)
        self.all_nsurv = out[-3]
        n_surv = int(np.asarray(self.all_nsurv).sum())
        n_total = self.n_rays_local * self.n_data
        self.pack_expand = n_total / max(n_surv, 1)
        n_miss = float(out[-1])
        return {"miss_mse": float(out[-2]) / max(n_miss * 3.0, 1e-9),
                "expand": self.pack_expand}

    # --------------------------------------------------------------- state
    def init_state(self, key: jax.Array,
                   init_params: Optional[Any] = None,
                   master_dtype: Optional[Any] = None) -> TrainState:
        """Initialize (or adopt) params + optimizer state with mesh placement.

        master_dtype: optional dtype for the stored (master) weights and
        their optimizer moments, e.g. jnp.bfloat16 — the compute path
        already runs bf16 matmuls either way, so this only changes where
        rounding happens in the UPDATE (experiment knob; the measured
        accuracy cost is documented in BENCH_NOTES, f32 masters remain the
        default)."""
        if init_params is None:
            kc, kf = jax.random.split(key)
            init_params = {"nerf_coarse": init_nerf_params(kc, self.mcfg.nerf)}
            if self.rcfg_train.N_importance > 0:
                init_params["nerf_fine"] = init_nerf_params(kf, self.mcfg.nerf)
        if master_dtype is not None:
            init_params = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, master_dtype), init_params)
        pspecs = model_pspecs(init_params, self.mesh.shape["model"],
                              self.tensor_parallel)
        shardings = jax.tree_util.tree_map(
            lambda spec: NamedSharding(self.mesh, spec), pspecs,
            is_leaf=lambda x: isinstance(x, P))
        params = jax.device_put(init_params, shardings)
        # optimizer.init under jit: moment buffers inherit param shardings.
        opt_state = jax.jit(self.optimizer.init)(params)
        # Input-independent leaves (optax step counters) can come out of jit
        # with a SingleDeviceSharding on multi-axis meshes; once committed
        # (e.g. after a checkpoint-restore device_put) that clashes with the
        # mesh-placed arrays at the next jit. Pin them replicated.
        rep = NamedSharding(self.mesh, P())
        opt_state = jax.tree_util.tree_map(
            lambda x: x if isinstance(x.sharding, NamedSharding)
            else jax.device_put(x, rep), opt_state)
        step = jax.device_put(jnp.zeros([], jnp.int32),
                              NamedSharding(self.mesh, P()))
        return TrainState(params, opt_state, step)

    # --------------------------------------------------------------- train
    def _sample_batch(self, all_rays, all_rgbs, step: jnp.ndarray,
                      all_occm=None, all_nsurv=None):
        """Per-device sequential epoch-order read from the local shard.

        Step i of an epoch reads block [i*b, (i+1)*b) of the (per-epoch
        re-permuted, see `reshuffle`) local shard — every ray is visited
        exactly once per pass, matching DataLoader(shuffle=True) epoch
        semantics (reference train.py:89-94), and the read is a sequential
        DMA, not a random gather.

        With survivor packing (all_nsurv given) the read wraps over the
        survivor region [0, K) instead, K = floor(n_surv/b)*b: an "epoch"
        still advances by steps_per_epoch steps (LR schedule and epoch
        bookkeeping keep reference semantics) but every batch contains only
        rays the occupancy grid says intersect geometry — the store cycles
        through the survivors multiple times per epoch, re-randomized by
        the canonical per-epoch reshuffle.

        NOTE: the ray store MUST flow in as a traced argument — a closure
        capture would embed the whole store as an HLO constant (hundreds of
        MB for real scenes), exploding compile time."""
        b_local = self.batch_local
        spe = self.steps_per_epoch_local
        has_occm = all_occm is not None
        has_pack = all_nsurv is not None

        def local(rays_l, rgbs_l, step, *rest):
            rest = list(rest)
            occm_l = rest.pop(0) if has_occm else None
            nsurv_l = rest.pop(0) if has_pack else None
            off = (step % spe) * b_local
            if has_pack:
                K = jnp.maximum(nsurv_l[0] // b_local, 1) * b_local
                off = off % K
            rays = jax.lax.dynamic_slice(rays_l, (off, 0), (b_local, 8))
            rgbs = jax.lax.dynamic_slice(rgbs_l, (off, 0), (b_local, 3))
            if occm_l is None:
                return rays, rgbs
            occm = jax.lax.dynamic_slice(occm_l, (off,), (b_local,))
            return rays, rgbs, occm

        args = [all_rays, all_rgbs, step]
        extra_in = ()
        if has_occm:
            extra_in += (P("data"),)
            args.append(all_occm)
        if has_pack:
            extra_in += (P("data"),)
            args.append(all_nsurv)
        out_extra = (P("data"),) if has_occm else ()
        smapped = jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P("data"), P("data"), P()) + extra_in,
            out_specs=(P("data"), P("data")) + out_extra,
            check_vma=False)
        return smapped(*args)

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
        if self.tensor_parallel:
            # TP exists to validate the mesh abstraction (numerics-verified
            # on the XLA path, test_spmd.py::TestTensorParallel); the
            # production loss-fused Pallas path is intentionally dp-only —
            # a 1.2 M-param MLP's scaling axis is rays, not weights.
            raise ValueError(
                "fused_loss shards rays only; run with "
                "tensor_parallel=False (or drop fused_loss to use the XLA "
                "path, which supports the model axis)")
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
                  all_nsurv, key: jax.Array):
        if all_occm is None:
            rays, rgbs = self._sample_batch(all_rays, all_rgbs, state.step,
                                            all_nsurv=all_nsurv)
            occm = None
        else:
            rays, rgbs, occm = self._sample_batch(all_rays, all_rgbs,
                                                  state.step, all_occm,
                                                  all_nsurv=all_nsurv)
        loss, mse, grads = self._loss_and_grads(state.params, rays, rgbs,
                                                key, occm=occm)
        # kernels accumulate grads in f32; match the master dtype so the
        # optimizer moments keep it too (no-op for the default f32 masters)
        grads = jax.tree_util.tree_map(
            lambda g, p: g.astype(p.dtype), grads, state.params)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # Clamp: a packed batch can legitimately be all exactly-background
        # rays (mse == 0.0 -> psnr inf, which tensorboard rejects).
        psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))
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
            def _run(state, all_rays, all_rgbs, all_occm, all_nsurv, key,
                     n_steps):
                def body(st, _):
                    k = jax.random.fold_in(key, st.step)
                    return self._one_step(st, all_rays, all_rgbs, all_occm,
                                          all_nsurv, k)
                return jax.lax.scan(body, state, None, length=n_steps)
            self._run_steps = _run
        state, metrics = self._run_steps(state, self.all_rays, self.all_rgbs,
                                         self.all_occm, self.all_nsurv, key,
                                         n_steps)
        return state, metrics

    # -------------------------------------------------------------- render
    def render_fn(self, rcfg: RenderConfig, chunk: int,
                  device_out: bool = False) -> Callable:
        """Jitted sharded full-image renderer for a given static config.

        Input rays are padded+tiled to (n_data * T, chunk, 8); each device
        lax.map's over its T tiles. Cached per (rcfg, chunk, device_out).

        device_out=True keeps outputs as device arrays (no host transfer)
        so callers timing the render can sync on compute completion
        symmetrically with the CulledRenderer path (ADVICE round 4)."""
        cache_key = (rcfg, chunk, device_out)
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

        def render(params, rays, key=None):
            if key is None:
                key = jax.random.PRNGKey(0)
            R = rays.shape[0]
            granularity = self.n_data * chunk
            pad = (-R) % granularity
            # Pad with jnp so device-resident rays STAY on device: an
            # np.concatenate here would silently round-trip the whole ray
            # array device->host->device inside callers' timed regions
            # (~20 MB each way for an 800x800 frame — the exact tunnel
            # asymmetry the device_out path exists to avoid). Host numpy
            # input pays the same single upload it always did.
            rays_p = jnp.asarray(rays)
            if pad:
                # pad rows: keep near<far to avoid degenerate z ranges
                pad_rows = jnp.zeros((pad, 8), rays_p.dtype).at[:, 7].set(1.0)
                rays_p = jnp.concatenate([rays_p, pad_rows], 0)
            tiles = rays_p.reshape(-1, chunk, 8)
            out = jitted(params, tiles, key)
            if device_out:
                return {k: v.reshape((-1,) + v.shape[2:])[:R]
                        for k, v in out.items()}
            return {k: np.asarray(v.reshape((-1,) + v.shape[2:])[:R])
                    for k, v in out.items()}

        self._render_cache[cache_key] = render
        return render
