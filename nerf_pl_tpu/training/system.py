"""NeRFSystem: end-to-end training orchestration.

The reference's L4+L5 (lightning Trainer + LightningModule, train.py:27-148)
collapse into this one explicit class: dataset preparation, SPMD trainer
construction, the epoch loop (scan segments on device), full-image sharded
validation with TensorBoard image panels, top-k checkpointing and resume.

There is no DDP process spawning and no DataLoader: the device mesh replaces
the former, the on-device ray store the latter (parallel/spmd.py).
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Hparams
from ..datasets import dataset_dict
from ..models.embedding import EmbeddingConfig
from ..models.nerf import NeRFConfig
from ..parallel.mesh import make_mesh
from ..parallel.spmd import Trainer
from ..rendering.render import ModelConfig, RenderConfig
from ..utils.compile_cache import enable_compile_cache
from ..utils.visualization import visualize_depth
from .checkpoints import (TopKCheckpoints, device_fetch, load_checkpoint,
                          load_ckpt, load_meta, save_checkpoint)
from .losses import loss_dict
from .lr_schedule import get_lr_schedule
from .metrics import psnr as psnr_fn
from .metrics import ssim as ssim_fn
from .optimizers import get_optimizer


class NeRFSystem:
    def __init__(self, hparams: Hparams, mesh=None, log_dir: str = "logs",
                 ckpt_root: str = "ckpts", enable_tb: bool = True):
        self.hparams = hparams
        self.mesh = mesh
        enable_compile_cache(getattr(hparams, "compile_cache", None))
        self.log_dir = os.path.join(log_dir, hparams.exp_name)
        self.ckpt_dir = os.path.join(ckpt_root, hparams.exp_name)
        self.enable_tb = enable_tb
        self.writer = None
        self.mcfg = ModelConfig(
            nerf=NeRFConfig(),
            emb_xyz=EmbeddingConfig(3, 10),
            emb_dir=EmbeddingConfig(3, 4))

    # ----------------------------------------------------------------- data
    def prepare_data(self):
        hp = self.hparams
        dataset = dataset_dict[hp.dataset_name]
        kwargs = {"root_dir": hp.root_dir, "img_wh": tuple(hp.img_wh)}
        if hp.dataset_name == "llff":
            kwargs["spheric_poses"] = hp.spheric_poses
            # sharded val needs no per-GPU replication; val_num > 1 holds
            # out that many DISTINCT nearest-center views instead
            kwargs["val_num"] = hp.val_num
        self.train_dataset = dataset(split="train", **kwargs)
        self.val_dataset = dataset(split="val", **kwargs)

    # ---------------------------------------------------------------- setup
    def setup(self):
        from ..config import validate_hparams
        hp = validate_hparams(self.hparams)
        if self.mesh is None:
            n = min(hp.num_gpus, len(jax.devices()))
            self.mesh = make_mesh(num_data=max(n, 1))

        compute_dtype = (jnp.bfloat16 if hp.precision == "bfloat16"
                         else jnp.float32)
        white_back = self.train_dataset.white_back
        self.rcfg_train = RenderConfig(
            N_samples=hp.N_samples, N_importance=hp.N_importance,
            use_disp=hp.use_disp, perturb=hp.perturb,
            noise_std=hp.noise_std, white_back=white_back,
            compute_dtype=compute_dtype, fused=hp.fused_mlp,
            fused_train=hp.fused_train,
            # the loss-fused single-kernel step is exactly the reference MSE
            fused_loss=(hp.fused_train and hp.loss_type == "mse"),
            occ_keepalive=hp.occ_keepalive)
        # Validation renders clean (no jitter/noise) full images.
        self.rcfg_val = RenderConfig(
            N_samples=hp.N_samples, N_importance=hp.N_importance,
            use_disp=hp.use_disp, perturb=0.0, noise_std=0.0,
            white_back=white_back, compute_dtype=compute_dtype,
            fused=hp.fused_mlp)

        # ceil: the ray store pads the tail batch (drop_last=False, the
        # reference DataLoader default) — matches Trainer.set_data padding.
        self.steps_per_epoch = max(
            1, -(-len(self.train_dataset) // hp.batch_size))
        self.lr_schedule = get_lr_schedule(
            hp.lr_scheduler, hp.lr, hp.num_epochs, self.steps_per_epoch,
            decay_step=hp.decay_step, decay_gamma=hp.decay_gamma,
            poly_exp=hp.poly_exp, warmup_multiplier=hp.warmup_multiplier,
            warmup_epochs=hp.warmup_epochs, optimizer=hp.optimizer)
        optimizer = get_optimizer(
            hp.optimizer, self.lr_schedule, momentum=hp.momentum,
            weight_decay=hp.weight_decay)

        self.trainer = Trainer(
            self.mesh, self.mcfg, self.rcfg_train, optimizer,
            self.lr_schedule, loss_dict[hp.loss_type], hp.batch_size)
        self.trainer.set_data(self.train_dataset.all_rays,
                              self.train_dataset.all_rgbs)

        # --precision bfloat16 with the fused kernels (which run bf16
        # matmuls regardless) selects bf16 MASTER weights + moments —
        # measured: no step-time change (params are ~1 MB, far off the
        # critical path), small accuracy cost; f32 masters stay the default.
        master_dtype = (jnp.bfloat16 if hp.precision == "bfloat16"
                        and (hp.fused_train or hp.fused_mlp) else None)
        self.state = self.trainer.init_state(jax.random.PRNGKey(hp.seed),
                                             master_dtype=master_dtype)
        if hp.ckpt_path:
            self._restore(hp.ckpt_path)

        if self.enable_tb and self.writer is None:
            from tensorboardX import SummaryWriter
            os.makedirs(self.log_dir, exist_ok=True)
            self.writer = SummaryWriter(self.log_dir)
        self.topk = TopKCheckpoints(self.ckpt_dir, k=5)

    def _restore(self, ckpt_path: str):
        """Full resume when the checkpoint holds a complete train state;
        otherwise a non-strict params-only load (reference load_ckpt)."""
        meta = load_meta(ckpt_path)
        try:
            state, meta = load_checkpoint(ckpt_path, self.state)
            self.state = jax.device_put(state, jax.tree_util.tree_map(
                lambda x: x.sharding, self.state))
            print(f"[resume] full train state from {ckpt_path} "
                  f"(step {int(self.state.step)})")
            return
        except (KeyError, ValueError) as e:
            print(f"[resume] partial load ({e})")
        params = self.state.params
        for model_name in params:
            params = load_ckpt(params, ckpt_path, model_name,
                               tuple(self.hparams.prefixes_to_ignore))
        shardings = jax.tree_util.tree_map(lambda x: x.sharding,
                                           self.state.params)
        self.state = self.state._replace(
            params=jax.device_put(params, shardings))
        print(f"[resume] params from {ckpt_path}")

    # ----------------------------------------------------------- occupancy
    def _occ_tighten(self):
        """Build an occupancy grid from the CURRENT params and clip every
        stored ray's sampling interval to its occupied-box union."""
        from ..rendering.occupancy import build_occupancy_grid, pick_block, \
            rays_aabb, resolve_ranges
        hp = self.hparams
        params = self.state.params.get("nerf_fine",
                                       self.state.params["nerf_coarse"])
        # the dataset rays never change — compute the hull once, not per
        # refresh (it materializes O(n_rays) temporaries on the host)
        if getattr(self, "_rays_aabb", None) is None:
            self._rays_aabb = rays_aabb(self.train_dataset.all_rays)
        aabb = self._rays_aabb
        self._occ_refresh_i = getattr(self, "_occ_refresh_i", -1) + 1
        auto = hp.occ_range is None
        ranges = resolve_ranges(
            hp.occ_range, params, self.mcfg, aabb=aabb,
            sigma_threshold=hp.occ_threshold)
        occ = build_occupancy_grid(
            params, self.mcfg, N=hp.occ_N, block=pick_block(hp.occ_N),
            ranges=ranges, sigma_threshold=hp.occ_threshold,
            max_ranges=aabb if auto else None,
            mode=hp.occ_mode,
            # visibility rays = the ORIGINAL training rays (the trainer
            # store's [near, far] is already tightened in place across
            # refreshes; marching must cover the full untightened span)
            vis_rays=(self.train_dataset.all_rays
                      if hp.occ_mode == "weight" else None),
            # vary the visibility-ray stride phase across refreshes so a
            # thin structure missed by one subsample is recovered by the
            # next rebuild instead of being pruned persistently
            vis_offset=self._occ_refresh_i)
        if occ.n_boxes == 0:
            print("[occ] grid empty (model not yet dense) — store unchanged")
            return
        st = self.trainer.tighten_store(
            occ.boxes, margin=hp.occ_margin, n_seg=hp.occ_segments,
            dilate=hp.occ_dilate, pack=hp.occ_pack)
        msg = (f"[occ] {occ.n_boxes} boxes "
               f"({occ.occupied_fraction * 100:.1f}% blocks occupied); "
               f"{st['hit_frac'] * 100:.1f}% rays hit, mean interval shrink "
               f"{st['shrink'] * 100:.1f}%")
        if hp.occ_segments:
            msg += (f", {hp.occ_segments}-segment masks"
                    + (f" (dilate {hp.occ_dilate})" if hp.occ_dilate else ""))
        if hp.occ_pack:
            msg += (f"; packed: x{st['expand']:.2f} effective batch, "
                    f"culled-ray residual mse {st['miss_mse']:.2e}")
        print(msg, flush=True)

    # ------------------------------------------------------------- validate
    def validate(self, global_step: int, max_items: Optional[int] = None
                 ) -> Dict[str, float]:
        hp = self.hparams
        W, H = hp.img_wh
        # --chunk bounds rays-in-flight exactly as in the reference forward
        # loop (train.py:53-63); --val_chunk is the TPU tile-size knob.
        render = self.trainer.render_fn(self.rcfg_val,
                                        chunk=min(hp.val_chunk, hp.chunk))
        typ = "fine" if hp.N_importance > 0 else "coarse"
        losses, psnrs, ssims = [], [], []
        n_items = len(self.val_dataset) if max_items is None else min(
            max_items, len(self.val_dataset))
        for i in range(n_items):
            sample = self.val_dataset[i]
            out = render(self.state.params, sample["rays"])
            rgbs = sample["rgbs"]
            loss = float(np.mean((out["rgb_coarse"] - rgbs) ** 2)
                         + (np.mean((out["rgb_fine"] - rgbs) ** 2)
                            if typ == "fine" else 0.0))
            losses.append(loss)
            pred = out[f"rgb_{typ}"]
            psnrs.append(float(psnr_fn(jnp.asarray(pred), jnp.asarray(rgbs))))
            img_pred = pred.reshape(H, W, 3).transpose(2, 0, 1)
            img_gt = rgbs.reshape(H, W, 3).transpose(2, 0, 1)
            ssims.append(float(ssim_fn(jnp.asarray(img_pred),
                                       jnp.asarray(img_gt))))
            if i == 0 and self.writer is not None:
                depth = visualize_depth(
                    out[f"depth_{typ}"].reshape(H, W))
                stack = np.stack([img_gt, img_pred, depth])  # (3,3,H,W)
                self.writer.add_images("val/GT_pred_depth", stack,
                                       global_step)
        metrics = {"val/loss": float(np.mean(losses)),
                   "val/psnr": float(np.mean(psnrs)),
                   "val/ssim": float(np.mean(ssims))}
        if self.writer is not None:
            for k, v in metrics.items():
                self.writer.add_scalar(k, v, global_step)
        return metrics

    # ------------------------------------------------------------------ fit
    def fit(self) -> Dict[str, float]:
        from ..utils.profiling import PhaseTimer, trace
        hp = self.hparams
        timer = self.timer = PhaseTimer()
        with timer.phase("prepare_data"):
            self.prepare_data()
        with timer.phase("setup"):
            self.setup()

        base_key = jax.random.PRNGKey(hp.seed + 1)
        start_step = int(self.state.step)
        start_epoch = start_step // self.steps_per_epoch
        # Replay the per-epoch shuffles a resumed run already consumed so the
        # store order matches the uninterrupted run. With survivor packing
        # past warmup the reshuffle is CANONICAL (layout is a pure function
        # of the grid + the last epoch key), so instead of replaying every
        # epoch, re-derive the grid from the restored params and apply only
        # the last key — exact when the resume epoch coincides with a grid
        # refresh, within one refresh of the live layout otherwise.
        packed_resume = (hp.occ_train and hp.occ_pack
                         and start_epoch >= hp.occ_warmup_epochs
                         and start_epoch >= 1)
        if packed_resume:
            self._occ_tighten()
            self.trainer.reshuffle(jax.random.fold_in(
                jax.random.PRNGKey(hp.seed + 2), start_epoch))
        else:
            for e in range(1, start_epoch + 1):
                self.trainer.reshuffle(
                    jax.random.fold_in(jax.random.PRNGKey(hp.seed + 2), e))
        total_steps = hp.num_epochs * self.steps_per_epoch
        print(f"[fit] {hp.num_epochs} epochs x {self.steps_per_epoch} "
              f"steps/epoch = {total_steps} steps "
              f"(resuming at {start_step}); mesh {dict(self.mesh.shape)}")

        # Sanity validation render before training (reference train.py:176).
        if start_step == 0:
            sanity = self.validate(0, max_items=1)
            print(f"[sanity] val/psnr={sanity['val/psnr']:.2f}")

        # Occupancy-tightened training: after warmup the current model's
        # occupancy grid clips every stored ray's [near, far] to its
        # occupied interval, so all N_samples land in (near-)occupied space
        # (the training-side analog of the eval-time culling; VERDICT r2 #1).
        # On resume past the warmup epoch, re-derive immediately from the
        # restored params so the store is tightened before any step runs.
        if hp.occ_train and not packed_resume and \
                start_epoch >= hp.occ_warmup_epochs and \
                start_step < total_steps:
            self._occ_tighten()

        metrics = {}
        step = start_step
        t_start = time.time()
        rays_done = 0
        profiled = False
        while step < total_steps:
            # Clamp every segment to the epoch boundary so the per-epoch
            # reshuffle fires exactly at steps_per_epoch multiples (a
            # mid-epoch segment would otherwise re-read early blocks of the
            # stale permutation) and resume replay matches by construction.
            to_boundary = self.steps_per_epoch - step % self.steps_per_epoch
            seg = min(hp.scan_steps, total_steps - step, to_boundary)
            epoch_before = step // self.steps_per_epoch
            # Profile the second segment (first includes compilation).
            do_trace = (hp.profile_dir and not profiled and step > 0)
            with timer.phase("train_segment"), \
                    trace(hp.profile_dir if do_trace else None):
                self.state, m = self.trainer.run_steps(
                    self.state, base_key, seg)
                jax.block_until_ready(self.state.params)
            if do_trace:
                profiled = True
                print(f"[profile] trace written to {hp.profile_dir}")
            m = {k: np.asarray(v) for k, v in m.items()}
            rays_done += seg * hp.batch_size
            step += seg
            if self.writer is not None:
                for local_i in range(0, seg, max(1, hp.log_every)):
                    gs = step - seg + local_i
                    self.writer.add_scalar("lr", m["lr"][local_i], gs)
                    self.writer.add_scalar("train/loss", m["loss"][local_i], gs)
                    self.writer.add_scalar("train/psnr", m["psnr"][local_i], gs)
            rate = rays_done / max(time.time() - t_start, 1e-9)
            eff = ""
            if self.trainer.pack_expand > 1.0:
                # Survivor packing: each batch row is a grid-surviving ray;
                # the culled remainder is covered analytically, so one
                # "reference epoch" of coverage costs 1/expand the steps.
                eff = (f", x{self.trainer.pack_expand:.2f} packed = "
                       f"{rate * self.trainer.pack_expand:,.0f} effective")
            print(f"[train] step {step}/{total_steps} "
                  f"loss={m['loss'][-1]:.4f} psnr={m['psnr'][-1]:.2f} "
                  f"({rate:,.0f} rays/s{eff})", flush=True)

            epoch = step // self.steps_per_epoch
            if epoch > epoch_before and step < total_steps:
                # DataLoader(shuffle=True)-style per-epoch reshuffle of the
                # on-device ray store (reference train.py:89-94). Key is a
                # pure function of (seed, epoch) so resume replays the same
                # shuffle sequence.
                self.trainer.reshuffle(
                    jax.random.fold_in(jax.random.PRNGKey(hp.seed + 2),
                                       epoch))
                if hp.occ_train and epoch >= hp.occ_warmup_epochs and \
                        (epoch - hp.occ_warmup_epochs) \
                        % max(hp.occ_refresh_epochs, 1) == 0:
                    with timer.phase("occ_tighten"):
                        self._occ_tighten()
            epoch_val = epoch > epoch_before or step >= total_steps
            # Mid-epoch validation (lightning val_check_interval analog):
            # fires at the first segment boundary past each multiple of
            # val_every_steps. Same validate + timestamped print as the
            # epoch-boundary val ([val] step S epoch E ... vs [val] epoch
            # E ...; scripts/northstar.py parses both for time-to-PSNR
            # artifacts) but does NOT checkpoint — top-k/last.ckpt stay
            # epoch-granular so resume replay semantics are unchanged.
            mid_val = not epoch_val and hp.val_every_steps and \
                step // hp.val_every_steps > \
                (step - seg) // hp.val_every_steps
            if epoch_val or mid_val:
                with timer.phase("validate"):
                    val = self.validate(step)
                metrics = {**val, "epoch": epoch, "step": step}
                tag = f"epoch {epoch}" if epoch_val \
                    else f"step {step} epoch {epoch}"
                print(f"[val] {tag} loss={val['val/loss']:.4f} "
                      f"psnr={val['val/psnr']:.2f} "
                      f"ssim={val['val/ssim']:.3f}", flush=True)
            if epoch_val:
                with timer.phase("checkpoint"):
                    # ONE pipelined device->host fetch serves both saves
                    # (each used to pay its own per-leaf tunnel round-trips)
                    host_state = device_fetch(self.state)
                    self.topk.maybe_save(host_state, val["val/loss"], epoch,
                                         meta={"step": step})
                    save_checkpoint(
                        os.path.join(self.ckpt_dir, "last.ckpt"),
                        host_state, {"step": step, "epoch": epoch})
        if self.writer is not None:
            self.writer.flush()
        print(f"[profiler]\n{timer.summary()}", flush=True)
        return metrics
