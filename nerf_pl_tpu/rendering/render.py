"""Volume rendering: stratified sampling, quadrature, hierarchical resampling.

Functional re-design of the reference rendering engine
(models/rendering.py:58-244). Differences that make it TPU-native:

  * `render_rays` is a pure function of (params, rays, key, static config) —
    one trace, one XLA program; randomness (depth jitter, sigma noise,
    importance-sample u) comes from explicit PRNG keys instead of global
    torch RNG state.
  * No Python chunk loops inside (reference rendering.py:123-135): a training
    batch renders in one shot; full-image eval tiles fixed-size ray blocks
    with `lax.map` (render_rays_chunked), so every shape is static and XLA
    keeps the MLP matmuls on the MXU at full tile size.
  * The hierarchical resampler uses the comparison-matrix inverse-CDF
    (ops/sample_pdf.py) instead of a CUDA binary-search extension.
  * Points keep their (rays, samples, C) shape end-to-end; the view-direction
    embedding broadcasts instead of being repeat_interleaved
    (reference rendering.py:119).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..models.embedding import EmbeddingConfig, embed
from ..models.nerf import NeRFConfig, nerf_apply
from ..ops.sample_pdf import sample_pdf


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static model-family config: MLP architecture + both embeddings."""
    nerf: NeRFConfig = NeRFConfig()
    emb_xyz: EmbeddingConfig = EmbeddingConfig(3, 10)
    emb_dir: EmbeddingConfig = EmbeddingConfig(3, 4)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering config (hashable -> jit static arg).

    Field semantics match the reference render_rays signature
    (models/rendering.py:58-69).
    """
    N_samples: int = 64
    N_importance: int = 0
    use_disp: bool = False
    perturb: float = 0.0
    noise_std: float = 0.0
    white_back: bool = False
    test_time: bool = False
    compute_dtype: Any = jnp.float32
    # Use the Pallas fused point-MLP (ops/fused_mlp.py). Requires the
    # default NeRF architecture; bf16 matmuls with f32 accumulation.
    fused: bool = False
    # Fully-fused TRAINING path (ops/fused_train.py): ray->MLP->quadrature
    # forward and the whole backward in single kernels (no standalone
    # forward remat). Requires the default architecture and a batch size
    # divisible by the ray tile; implies `fused` semantics.
    fused_train: bool = False
    # Loss-fused single-kernel step (fused_mse_train_step): forward + MSE
    # cotangent + backward in ONE kernel per pass (3x fwd FLOPs, no
    # standalone forward). Only valid for the reference MSE loss; the SPMD
    # Trainer takes this path instead of jax.value_and_grad when set.
    fused_loss: bool = False
    # Occupied-segment placement only: fraction of the coarse sample mass
    # spread uniformly over ALL segments of the (tightened) interval
    # instead of occupied ones. Keeps the model supervised at interior
    # empty gaps it would otherwise never sample after warmup, at zero
    # extra FLOPs (same sample count). Measured accuracy-neutral at the
    # culled32 recipe (16-epoch A/B on the 25-view hard400 test split:
    # 34.52 dB with keepalive=0.1 vs 34.49 without, docs/parity/
    # hard400_c32k vs hard400_c32) — optional insurance, not required.
    occ_keepalive: float = 0.0


def volume_quadrature(sigmas: jnp.ndarray,
                      z_vals: jnp.ndarray,
                      dir_norms: jnp.ndarray,
                      noise: Optional[jnp.ndarray],
                      rgbs: Optional[jnp.ndarray],
                      white_back: bool):
    """Quadrature of the volume-rendering integral along each ray.

    Math parity with reference rendering.py:144-170: deltas with an infinite
    last interval, scaled by the (pre-normalization) direction norm; sigma
    noise regularizer; alpha = 1 - exp(-delta * relu(sigma + noise));
    transmittance by exclusive cumprod of (1 - alpha + 1e-10); weighted
    RGB/depth sums; optional white-background compositing.

    Args:
      sigmas: (R, S) raw densities.  z_vals: (R, S) sample depths.
      dir_norms: (R, 1) ray-direction norms.  noise: (R, S) or None.
      rgbs: (R, S, 3) or None (weights-only path).

    Returns: dict with 'weights' (R, S), 'opacity' (R,), and — when rgbs is
    given — 'rgb' (R, 3) and 'depth' (R,).
    """
    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    delta_inf = jnp.full_like(deltas[:, :1], 1e10)
    deltas = jnp.concatenate([deltas, delta_inf], axis=-1) * dir_norms

    if noise is not None:
        sigmas = sigmas + noise
    alphas = 1.0 - jnp.exp(-deltas * jax.nn.relu(sigmas))
    # Exclusive cumprod for transmittance T_i = prod_{j<i} (1 - a_j).
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-10], axis=-1)
    transmittance = jnp.cumprod(shifted, axis=-1)[:, :-1]
    weights = alphas * transmittance
    opacity = jnp.sum(weights, axis=-1)

    out = {"weights": weights, "opacity": opacity}
    if rgbs is not None:
        rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)
        depth = jnp.sum(weights * z_vals, axis=-1)
        if white_back:
            rgb = rgb + (1.0 - opacity[..., None])
        out["rgb"] = rgb
        out["depth"] = depth
    return out


def _evaluate_field(params, xyz, rays_d, dir_emb, z_vals, dir_norms,
                    noise_key, cfg: RenderConfig, mcfg: ModelConfig,
                    sigma_only: bool):
    """Embed sampled points, run the MLP, integrate. Returns quadrature dict."""
    if cfg.fused and not sigma_only:
        # Pallas path embeds in-kernel: feed raw positions/directions.
        from ..ops.fused_mlp import nerf_apply_fused
        rgbs, sigma = nerf_apply_fused(params, xyz, rays_d[:, None, :])
    elif cfg.fused and sigma_only:
        from ..ops.fused_mlp import nerf_sigma_fused
        sigma = nerf_sigma_fused(params, xyz)
        rgbs = None
    elif sigma_only:
        xyz_emb = embed(xyz, cfg=mcfg.emb_xyz)  # (R, S, 63)
        sigma = nerf_apply(params, xyz_emb, None, cfg=mcfg.nerf,
                           sigma_only=True, compute_dtype=cfg.compute_dtype)
        rgbs = None
    else:
        xyz_emb = embed(xyz, cfg=mcfg.emb_xyz)
        rgbs, sigma = nerf_apply(params, xyz_emb, dir_emb[:, None, :],
                                 cfg=mcfg.nerf, sigma_only=False,
                                 compute_dtype=cfg.compute_dtype)
    sigmas = sigma[..., 0]  # (R, S)

    noise = None
    if cfg.noise_std > 0:
        noise = cfg.noise_std * jax.random.normal(
            noise_key, sigmas.shape, dtype=sigmas.dtype)
    return volume_quadrature(sigmas, z_vals, dir_norms, noise, rgbs,
                             cfg.white_back)


def occupied_z_vals(rays: jnp.ndarray, occm: jnp.ndarray, n_seg: int,
                    N_samples: int, perturb: float,
                    key: jax.Array, keepalive: float = 0.0) -> jnp.ndarray:
    """Coarse sample placement concentrated in occupied space.

    Each ray's [near, far] is split into ``n_seg`` equal segments with a
    per-ray occupancy bitmask (occupancy.py ray_box_segment_bits, refreshed
    with the training grid); z values are drawn by stratified inverse CDF
    over the piecewise-constant density "occupied = 1, empty = eps". All
    N_samples therefore land in (near-)occupied segments — per-unit-length
    sample density scales with 1/occupied_length instead of
    1/(far - near), which is what lets a culled 32-sample run match a
    dense 64-sample run's effective resolution (the NerfAcc capability,
    restructured: static shapes, zero gathers, mask precomputed per ray).

    The strata ascend, so the output is sorted without a sort; perturb
    follows the reference's convention (perturb=0 -> stratum midpoints,
    deterministic; perturb=1 -> uniform within each stratum).

    ``keepalive`` in [0, 1) mixes a fraction of the sample mass back onto
    ALL segments (per-segment weight (1-k)*bit/n_occ + k/n_seg): interior
    gaps keep receiving ~k of the samples, so sigma there stays supervised
    for dense-sampling evaluation instead of drifting unconstrained.

    Returns (R, N_samples) ascending sample depths in [near, far].
    """
    from .occupancy import unpack_segment_bits
    R = rays.shape[0]
    near, far = rays[:, 6:7], rays[:, 7:8]
    seg = jnp.arange(n_seg + 1, dtype=rays.dtype) / n_seg
    edges = near * (1.0 - seg) + far * seg             # (R, n_seg+1)
    bits = unpack_segment_bits(occm, n_seg)            # (R, n_seg)
    if keepalive > 0.0:
        n_occ = jnp.maximum(jnp.sum(bits, axis=-1, keepdims=True), 1.0)
        bits = (1.0 - keepalive) * bits / n_occ + keepalive / n_seg
    j = jnp.arange(N_samples, dtype=rays.dtype)
    if perturb > 0:
        xi = perturb * jax.random.uniform(
            key, (R, N_samples), dtype=rays.dtype) + (1.0 - perturb) * 0.5
    else:
        xi = jnp.full((R, N_samples), 0.5, rays.dtype)
    u = (j + xi) / N_samples
    return sample_pdf(edges, bits, N_samples, det=True, u=u)


def render_rays(params: Dict[str, Any],
                rays: jnp.ndarray,
                key: jax.Array,
                cfg: RenderConfig,
                mcfg: ModelConfig = ModelConfig(),
                occm: jnp.ndarray | None = None,
                n_seg: int = 0) -> Dict[str, jnp.ndarray]:
    """Render a batch of rays through the coarse(+fine) NeRF.

    Args:
      params: {'nerf_coarse': Params, 'nerf_fine': Params (iff N_importance>0)}.
      rays: (R, 8) = [origin(3), direction(3), near(1), far(1)].
      key: PRNG key driving depth jitter / sigma noise / importance u.
      cfg, mcfg: static configs.
      occm, n_seg: optional (R,) uint32 per-ray occupancy bitmask + its
        static segment count — coarse samples then concentrate in occupied
        segments (occupied_z_vals) instead of covering [near, far]
        uniformly. Training-time only (--occ_train).

    Returns dict keyed like the reference (rendering.py:213-242):
      rgb_coarse/depth_coarse/opacity_coarse (omitting rgb/depth when
      test_time), and rgb_fine/depth_fine/opacity_fine when N_importance > 0.
    """
    k_perturb, k_noise_c, k_importance, k_noise_f = jax.random.split(key, 4)

    R = rays.shape[0]
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    dir_norms = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)  # (R, 1)
    dir_emb = embed(rays_d, cfg=mcfg.emb_dir)                    # (R, 27)

    if occm is not None:
        z_vals = occupied_z_vals(rays, occm, n_seg, cfg.N_samples,
                                 cfg.perturb, k_perturb,
                                 keepalive=cfg.occ_keepalive)
    else:
        z_steps = jnp.linspace(0.0, 1.0, cfg.N_samples, dtype=rays.dtype)
        if not cfg.use_disp:  # linear in depth
            z_vals = near * (1.0 - z_steps) + far * z_steps
        else:                 # linear in disparity
            z_vals = 1.0 / (1.0 / near * (1.0 - z_steps)
                            + 1.0 / far * z_steps)
        z_vals = jnp.broadcast_to(z_vals, (R, cfg.N_samples))

        if cfg.perturb > 0:
            z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
            upper = jnp.concatenate([z_mid, z_vals[:, -1:]], axis=-1)
            lower = jnp.concatenate([z_vals[:, :1], z_mid], axis=-1)
            perturb_rand = cfg.perturb * jax.random.uniform(
                k_perturb, z_vals.shape, dtype=z_vals.dtype)
            z_vals = lower + (upper - lower) * perturb_rand

    if (cfg.fused and cfg.test_time and cfg.perturb == 0
            and cfg.noise_std == 0):
        # Fully-fused inference: ray->points->MLP->quadrature in one Pallas
        # kernel per pass; only per-ray data crosses HBM (~25x less traffic
        # than the per-point path at full-image scale).
        from ..ops.fused_render import fused_render_eval, fused_sigma_render
        weights_c, opacity_c = fused_sigma_render(
            params["nerf_coarse"], rays, z_vals)
        result = {"opacity_coarse": opacity_c}
        if cfg.N_importance > 0:
            z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
            z_fine = sample_pdf(z_mid, weights_c[:, 1:-1],
                                cfg.N_importance, det=True, key=k_importance)
            z_all = jnp.sort(jnp.concatenate([z_vals, z_fine], axis=-1),
                             axis=-1)
            fine = fused_render_eval(params["nerf_fine"], rays, z_all,
                                     white_back=cfg.white_back)
            result["rgb_fine"] = fine["rgb"]
            result["depth_fine"] = fine["depth"]
            result["opacity_fine"] = fine["opacity"]
        return result

    if cfg.fused_train and not cfg.test_time:
        # Fully-fused training path: one fwd kernel + one bwd kernel per
        # pass (quadrature VJP in-kernel), 3x forward FLOPs total instead
        # of the point-MLP custom VJP's 4x.
        from ..ops.fused_mlp import pack_params
        from ..ops.fused_train import fused_train_render

        def tile_noise(k, shape):
            if cfg.noise_std > 0:
                return cfg.noise_std * jax.random.normal(k, shape,
                                                         dtype=jnp.float32)
            return jnp.zeros(shape, jnp.float32)

        out_c, weights_c = fused_train_render(
            pack_params(params["nerf_coarse"]), rays, z_vals,
            tile_noise(k_noise_c, z_vals.shape), cfg.white_back)
        result = {"rgb_coarse": out_c[:, 0:3],
                  "depth_coarse": out_c[:, 3],
                  "opacity_coarse": out_c[:, 4]}
        if cfg.N_importance > 0:
            z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
            z_fine = sample_pdf(z_mid, weights_c[:, 1:-1],
                                cfg.N_importance, det=(cfg.perturb == 0),
                                key=k_importance)
            z_fine = jax.lax.stop_gradient(z_fine)
            z_all = jnp.sort(jnp.concatenate([z_vals, z_fine], axis=-1),
                             axis=-1)
            out_f, _ = fused_train_render(
                pack_params(params["nerf_fine"]), rays, z_all,
                tile_noise(k_noise_f, z_all.shape), cfg.white_back)
            result["rgb_fine"] = out_f[:, 0:3]
            result["depth_fine"] = out_f[:, 3]
            result["opacity_fine"] = out_f[:, 4]
        return result

    xyz_coarse = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]

    coarse = _evaluate_field(
        params["nerf_coarse"], xyz_coarse, rays_d, dir_emb, z_vals,
        dir_norms, k_noise_c, cfg, mcfg, sigma_only=cfg.test_time)

    if cfg.test_time:
        result = {"opacity_coarse": coarse["opacity"]}
    else:
        result = {"rgb_coarse": coarse["rgb"],
                  "depth_coarse": coarse["depth"],
                  "opacity_coarse": coarse["opacity"]}

    if cfg.N_importance > 0:
        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        z_fine = sample_pdf(z_mid, coarse["weights"][:, 1:-1],
                            cfg.N_importance, det=(cfg.perturb == 0),
                            key=k_importance)
        # No gradient into the coarse weights through the resampling
        # (reference detaches, rendering.py:225-227).
        z_fine = jax.lax.stop_gradient(z_fine)
        z_all = jnp.sort(jnp.concatenate([z_vals, z_fine], axis=-1), axis=-1)

        xyz_fine = rays_o[:, None, :] + rays_d[:, None, :] * z_all[..., None]
        fine = _evaluate_field(
            params["nerf_fine"], xyz_fine, rays_d, dir_emb, z_all,
            dir_norms, k_noise_f, cfg, mcfg, sigma_only=False)
        result["rgb_fine"] = fine["rgb"]
        result["depth_fine"] = fine["depth"]
        result["opacity_fine"] = fine["opacity"]

    return result


def fused_mse_train_step(params: Dict[str, Any],
                         rays: jnp.ndarray,
                         rgbs: jnp.ndarray,
                         key: jax.Array,
                         cfg: RenderConfig,
                         global_batch: int,
                         mcfg: ModelConfig = ModelConfig(),
                         occm: jnp.ndarray | None = None,
                         n_seg: int = 0):
    """Loss-fused training step: loss value, render outputs AND parameter
    gradients from ONE Pallas kernel per model pass (no jax.grad).

    The MSE cotangent is computed in-kernel (ops/fused_train.py
    fused_mse_render), so each pass costs 3x forward FLOPs instead of the
    custom-VJP path's 4x. Valid exactly for the reference loss
    (losses.py:4-17: sum of per-pass MSE means) — the only loss in the
    reference's loss_dict.

    Args:
      rays: (R_local, 8). rgbs: (R_local, 3) ground truth.
      global_batch: GLOBAL ray count of the step (cotangent scale under
        data parallelism; psum the returned grads over the data axis).

    Returns (loss_local_sum, result dict, grads pytree like params).
      loss_local_sum is the SUM over local rays of the per-ray squared
      error means — divide by global_batch (after psum) for the loss.
    """
    from ..ops.fused_mlp import pack_params, unpack_grads
    from ..ops.fused_train import fused_mse_render

    k_perturb, k_noise_c, k_importance, k_noise_f = jax.random.split(key, 4)
    R = rays.shape[0]
    near, far = rays[:, 6:7], rays[:, 7:8]
    if occm is not None:
        z_vals = occupied_z_vals(rays, occm, n_seg, cfg.N_samples,
                                 cfg.perturb, k_perturb,
                                 keepalive=cfg.occ_keepalive)
    else:
        z_steps = jnp.linspace(0.0, 1.0, cfg.N_samples, dtype=rays.dtype)
        if not cfg.use_disp:
            z_vals = near * (1.0 - z_steps) + far * z_steps
        else:
            z_vals = 1.0 / (1.0 / near * (1.0 - z_steps)
                            + 1.0 / far * z_steps)
        z_vals = jnp.broadcast_to(z_vals, (R, cfg.N_samples))
        if cfg.perturb > 0:
            z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
            upper = jnp.concatenate([z_mid, z_vals[:, -1:]], axis=-1)
            lower = jnp.concatenate([z_vals[:, :1], z_mid], axis=-1)
            z_vals = lower + (upper - lower) * cfg.perturb * \
                jax.random.uniform(k_perturb, z_vals.shape,
                                   dtype=z_vals.dtype)

    def tile_noise(k, shape):
        if cfg.noise_std > 0:
            return cfg.noise_std * jax.random.normal(k, shape,
                                                     dtype=jnp.float32)
        return jnp.zeros(shape, jnp.float32)

    gt8 = jnp.pad(rgbs, ((0, 0), (0, 5)))
    scale = 1.0 / (global_batch * 3)

    out_c, weights_c, g_c = fused_mse_render(
        pack_params(params["nerf_coarse"]), rays, z_vals,
        tile_noise(k_noise_c, z_vals.shape), gt8, cfg.white_back, scale)
    result = {"rgb_coarse": out_c[:, 0:3],
              "depth_coarse": out_c[:, 3],
              "opacity_coarse": out_c[:, 4]}
    loss_sum = jnp.sum((out_c[:, 0:3] - rgbs) ** 2) / 3.0
    grads = {"nerf_coarse": unpack_grads(g_c, params["nerf_coarse"])}

    if cfg.N_importance > 0:
        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        z_fine = sample_pdf(z_mid, weights_c[:, 1:-1], cfg.N_importance,
                            det=(cfg.perturb == 0), key=k_importance)
        z_all = jnp.sort(jnp.concatenate([z_vals, z_fine], axis=-1),
                         axis=-1)
        out_f, _, g_f = fused_mse_render(
            pack_params(params["nerf_fine"]), rays, z_all,
            tile_noise(k_noise_f, z_all.shape), gt8, cfg.white_back, scale)
        result["rgb_fine"] = out_f[:, 0:3]
        result["depth_fine"] = out_f[:, 3]
        result["opacity_fine"] = out_f[:, 4]
        loss_sum = loss_sum + jnp.sum((out_f[:, 0:3] - rgbs) ** 2) / 3.0
        grads["nerf_fine"] = unpack_grads(g_f, params["nerf_fine"])

    return loss_sum, result, grads


def render_rays_chunked(params: Dict[str, Any],
                        rays: jnp.ndarray,
                        key: jax.Array,
                        cfg: RenderConfig,
                        mcfg: ModelConfig = ModelConfig(),
                        chunk: int = 4096) -> Dict[str, jnp.ndarray]:
    """Render an arbitrary number of rays by tiling fixed-size blocks.

    Replaces the reference's host-side Python chunk loop (train.py:49-71,
    eval.py:58-86) with a single jittable `lax.map` over padded fixed-shape
    tiles: one compile regardless of image size, sequential tiles bound
    peak memory exactly like chunking did.
    """
    R = rays.shape[0]
    n_chunks = -(-R // chunk)
    pad = n_chunks * chunk - R
    rays_p = jnp.pad(rays, ((0, pad), (0, 0)))
    # Dead padded rays: keep near/far sane (zeros give degenerate z ranges
    # but still finite math); results are sliced off below.
    rays_p = rays_p.reshape(n_chunks, chunk, 8)
    keys = jax.random.split(key, n_chunks)

    out = jax.lax.map(
        lambda args: render_rays(params, args[0], args[1], cfg, mcfg),
        (rays_p, keys))
    return {k: v.reshape((n_chunks * chunk,) + v.shape[2:])[:R]
            for k, v in out.items()}
