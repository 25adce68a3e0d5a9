"""Fully-fused TRAINING renderer: ray->points->MLP->quadrature forward and
the whole backward (quadrature VJP + MLP VJP) in single Pallas kernels.

Why: the round-1 training path paid 4x forward FLOPs per step — a forward
kernel for the loss value, then a backward kernel that REMATERIALIZES the
forward before computing gradients, plus XLA-side quadrature fwd+bwd between
them. Fusing quadrature into the kernels removes the standalone forward's
activations from the backward's responsibility chain entirely:

  * forward kernel: rays+z+noise -> per-ray rgb/depth/opacity AND the
    per-sample weights (needed by sample_pdf) — same shape as
    ops/fused_render.py but with the training semantics (sigma noise,
    weights output, f32 quadrature parity with rendering/render.py
    volume_quadrature, reference models/rendering.py:144-170);
  * backward kernel: given per-RAY cotangents (dL/drgb, dL/ddepth,
    dL/dopacity, dL/dweights), recomputes the forward in VMEM, backprops
    the quadrature analytically (one extra strictly-lower-triangular MXU
    matmul for the suffix sums) to per-POINT cotangents, and feeds them to
    the shared MLP gradient body (ops/fused_mlp._mlp_grads). Weight grads
    accumulate in VMEM scratch across the sequential grid.

Quadrature backward derivation (per ray; o_k = delta_k * relu(sigma_k+n_k),
alpha_k = 1-exp(-o_k), T_k = exp(-sum_{j<k} o_j), w_k = alpha_k*T_k,
rgb = sum w_k c_k (+ white_back*(1-sum w)), depth = sum w_k z_k):
  a_k := dL/dw_k = g_rgb.c_k + g_depth*z_k + g_op + g_w_k
                   - white_back * sum(g_rgb)
  dL/do_k = a_k*(T_k - w_k) - sum_{i>k} a_i*w_i       [suffix via MXU]
  dL/dsigma_k = dL/do_k * delta_k * [sigma_k + n_k > 0]
  dL/dc_k = w_k * g_rgb
z, noise, and rays receive zero gradients (z is stop-gradient'd by the
hierarchical sampler — reference rendering.py:225-227 — and noise/rays are
data), matching the XLA path's effective gradient flow.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import (_cast, _const_block, _consts, _forward_body,
                        _interpret, _mlp_grads, _precast, N_PACKED,
                        _VMEM_LIMIT)
from .fused_render import _build_points, _strict_upper


def _strict_lower(S: int) -> jnp.ndarray:
    return jnp.asarray(np.tril(np.ones((S, S), np.float32), k=-1))


def _quad_forward(rays, z, noise, sigmas, tri_u, white_back,
                  rgb_planes=None):
    """Training quadrature on a ray tile; returns the full intermediate set
    so forward and backward kernels share one definition."""
    dir_norm = jnp.sqrt(jnp.sum(rays[:, 3:6] ** 2, axis=-1, keepdims=True))
    deltas = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full_like(z[:, :1], 1e10)],
        axis=-1) * dir_norm
    s_eff = sigmas + noise
    optical = deltas * jnp.maximum(s_eff, 0.0)
    exp_neg = jnp.exp(-optical)                          # exp(-o_k), exact 0
    alphas = 1.0 - exp_neg                               # at saturation
    # HIGHEST: TPU f32 dots default to one bf16 MXU pass; the prefix sums
    # feed exp() where rounding visibly corrupts transmittance.
    csum = jax.lax.dot(-optical, tri_u, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    trans = jnp.exp(csum)                                # T_k
    weights = alphas * trans
    opacity = jnp.sum(weights, axis=-1, keepdims=True)
    rgb = depth = None
    if rgb_planes is not None:
        rgb = jnp.concatenate(
            [jnp.sum(weights * pc, axis=-1, keepdims=True)
             for pc in rgb_planes], axis=-1)
        depth = jnp.sum(weights * z, axis=-1, keepdims=True)
        if white_back:
            rgb = rgb + (1.0 - opacity)
    return deltas, s_eff, exp_neg, trans, weights, opacity, rgb, depth


def _train_fwd_kernel(white_back: int, S: int, R_TILE: int,
                      rays_ref, z_ref, noise_ref, tri_u_ref,
                      fx_ref, mx_ref, fd_ref, md_ref, *refs):
    *w_refs, out_ref, w_out_ref = refs
    consts_n = (fx_ref[:], mx_ref[:], fd_ref[:], md_ref[:])
    ws_ = [r[:] for r in w_refs]
    rays = rays_ref[:]
    z = z_ref[:]
    p8, d8 = _build_points(rays, z)
    sigma8, rgb8, *_ = _forward_body(p8, d8, consts_n, ws_, keep_acts=False)
    sigmas = sigma8[:, 0:1].reshape(R_TILE, S)
    rgb_planes = [rgb8[:, c:c + 1].reshape(R_TILE, S) for c in range(3)]
    _, _, _, _, weights, opacity, rgb, depth = _quad_forward(
        rays, z, noise_ref[:], sigmas, tri_u_ref[:], bool(white_back),
        rgb_planes)
    out_ref[:, 0:3] = rgb
    out_ref[:, 3:4] = depth
    out_ref[:, 4:5] = opacity
    out_ref[:, 5:8] = jnp.zeros_like(out_ref[:, 5:8])
    w_out_ref[:] = weights


def _train_bwd_kernel(white_back: int, S: int, R_TILE: int,
                      rays_ref, z_ref, noise_ref, g8_ref, gw_ref,
                      tri_u_ref, tri_l_ref,
                      fx_ref, mx_ref, fd_ref, md_ref, *refs):
    w_refs = refs[:N_PACKED]
    # Outputs double as the accumulators: every grid step maps to the same
    # block (index 0), so the buffers stay VMEM-resident across the
    # sequential grid and are flushed to HBM once at the end (a separate
    # scratch copy would duplicate ~2.4 MB of VMEM).
    acc_refs = refs[N_PACKED:2 * N_PACKED]
    consts_n = (fx_ref[:], mx_ref[:], fd_ref[:], md_ref[:])
    ws_ = [r[:] for r in w_refs]

    rays = rays_ref[:]
    z = z_ref[:]
    noise = noise_ref[:]
    p8, d8 = _build_points(rays, z)
    fwd = _forward_body(p8, d8, consts_n, ws_, keep_acts=True)
    sigma8, rgb8 = fwd[0], fwd[1]
    sigmas = sigma8[:, 0:1].reshape(R_TILE, S)
    rgb_planes = [rgb8[:, c:c + 1].reshape(R_TILE, S) for c in range(3)]
    deltas, s_eff, exp_neg, trans, weights, _, _, _ = _quad_forward(
        rays, z, noise, sigmas, tri_u_ref[:], bool(white_back), None)

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in acc_refs:
            r[:] = jnp.zeros_like(r)

    g8 = g8_ref[:]                       # (R, 8): g_rgb(3), g_depth, g_op
    g_rgb = [g8[:, c:c + 1] for c in range(3)]        # each (R, 1)
    g_depth = g8[:, 3:4]
    g_op = g8[:, 4:5]

    # a_k = dL/dw_k
    a = gw_ref[:] + g_depth * z + g_op
    for c in range(3):
        a = a + g_rgb[c] * rgb_planes[c]
    if white_back:
        a = a - (g_rgb[0] + g_rgb[1] + g_rgb[2])

    aw = a * weights
    suffix = jax.lax.dot(aw, tri_l_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
    # T_k * exp(-o_k), NOT (T_k - w_k): the subtraction cancels
    # catastrophically for saturated samples, and the error is then
    # amplified by delta (the last interval is 1e10) in d_sigma.
    d_optical = a * trans * exp_neg - suffix
    d_sigma = jnp.where(s_eff > 0, d_optical * deltas, 0.0)  # (R, S)

    # per-point cotangents, packed back to (R*S, 8)
    g_sig_plane = d_sigma[..., None]                         # (R, S, 1)
    zeros7 = jnp.zeros((R_TILE, S, 7), jnp.float32)
    g_sigma8 = jnp.concatenate([g_sig_plane, zeros7],
                               axis=-1).reshape(R_TILE * S, 8)
    g_rgb_planes = [(weights * g_rgb[c])[..., None] for c in range(3)]
    zeros5 = jnp.zeros((R_TILE, S, 5), jnp.float32)
    g_rgb8 = jnp.concatenate(g_rgb_planes + [zeros5],
                             axis=-1).reshape(R_TILE * S, 8)

    _mlp_grads(p8, d8, ws_, fwd, g_rgb8, g_sigma8, acc_refs)


def _ray_tile_specs(R_TILE, S, n_extra8=0):
    """Block specs for (rays, z, noise[, g8, ...]) tiles."""
    specs = [pl.BlockSpec((R_TILE, 8), lambda i: (i, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((R_TILE, S), lambda i: (i, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((R_TILE, S), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)]
    for _ in range(n_extra8):
        specs.append(pl.BlockSpec((R_TILE, 8), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM))
    return specs


def _r_tile(points_per_tile: int, S: int, R: int) -> int:
    """Largest multiple-of-8 divisor of R within the points budget.

    The train path refuses to pad (padded duplicate rays would contribute
    spurious weight gradients), so R itself must be a multiple of 8."""
    if R % 8:
        raise ValueError(
            f"fused train path needs a ray batch divisible by 8, got {R}")
    r = min(max((points_per_tile // S) // 8 * 8, 8), R)
    while R % r:
        r -= 8
    return r


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_train_render(packed, rays, z_vals, noise,
                       white_back: bool,
                       fwd_points_per_tile: int = 8192,
                       bwd_points_per_tile: int = 4096):
    """Fused train-time render of a ray batch through ONE NeRF model.

    Args:
      packed: pack_params(model_params).
      rays: (R, 8).  z_vals: (R, S) sorted sample depths.
      noise: (R, S) sigma-noise (zeros when noise_std == 0).

    Returns (out8 (R, 8) [rgb(3), depth(1), opacity(1), 0...],
             weights (R, S)).
    Differentiable in `packed` only; rays/z/noise get zero gradients
    (matching the reference's detached resampling + data semantics).
    """
    return _train_fwd_call(packed, rays, z_vals, noise, white_back,
                           fwd_points_per_tile)


def _train_fwd_call(packed, rays, z_vals, noise, white_back, ppt):
    R, S = z_vals.shape
    r_tile = _r_tile(ppt, S, R)
    tri_u = _strict_upper(S)
    kernel = functools.partial(_train_fwd_kernel, int(white_back), S, r_tile)
    in_specs = (_ray_tile_specs(r_tile, S)
                + [_const_block(tri_u)]
                + [_const_block(c) for c in _consts()]
                + [_const_block(w) for w in packed])
    out8, weights = pl.pallas_call(
        kernel,
        grid=(R // r_tile,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((r_tile, 8), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((r_tile, S), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((R, 8), jnp.float32),
                   jax.ShapeDtypeStruct((R, S), jnp.float32)),
        interpret=_interpret(),
        compiler_params=_VMEM_LIMIT,
    )(rays, z_vals, noise, tri_u, *_consts(), *_precast(packed))
    return out8, weights


def _train_fwd(packed, rays, z_vals, noise, white_back, fppt, bppt):
    out = _train_fwd_call(packed, rays, z_vals, noise, white_back, fppt)
    return out, (packed, rays, z_vals, noise)


def _train_bwd(white_back, fppt, bppt, residuals, g):
    packed, rays, z_vals, noise = residuals
    g8, gw = g
    R, S = z_vals.shape
    r_tile = _r_tile(bppt, S, R)
    tri_u = _strict_upper(S)
    tri_l = _strict_lower(S)
    kernel = functools.partial(_train_bwd_kernel, int(white_back), S, r_tile)
    in_specs = (_ray_tile_specs(r_tile, S, n_extra8=1)
                + [pl.BlockSpec((r_tile, S), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)]     # gw
                + [_const_block(tri_u), _const_block(tri_l)]
                + [_const_block(c) for c in _consts()]
                + [_const_block(w) for w in packed])
    out_shapes = tuple(jax.ShapeDtypeStruct(p.shape, jnp.float32)
                       for p in packed)
    out_specs = tuple(_const_block(p) for p in packed)
    grads = pl.pallas_call(
        kernel,
        grid=(R // r_tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
        compiler_params=_VMEM_LIMIT,
    )(rays, z_vals, noise, g8, gw, tri_u, tri_l, *_consts(),
      *_precast(packed))
    return (grads, jnp.zeros_like(rays), jnp.zeros_like(z_vals),
            jnp.zeros_like(noise))


fused_train_render.defvjp(_train_fwd, _train_bwd)


# ---------------------------------------------------------------------------
# Loss-fused single-kernel step: forward + MSE cotangent + full backward in
# ONE Pallas kernel.
#
# The custom-VJP path above still pays 4x forward FLOPs per pass: a forward
# kernel for the loss value, then a backward kernel that recomputes the
# forward before the 2x-forward gradient matmuls. When the loss is the
# reference MSE (losses.py:4-17: mean over rays x rgb channels, coarse and
# fine terms summed), the cotangent is closed-form — g_rgb = 2*(rgb-gt)*scale
# — so the forward, the cotangent, and the whole backward can run inside one
# kernel while the activations are still in VMEM: 3x forward FLOPs total,
# no standalone forward, no recompute.
# ---------------------------------------------------------------------------

def _mse_fwdbwd_kernel(white_back: int, S: int, R_TILE: int, scale: float,
                       rays_ref, z_ref, noise_ref, gt_ref,
                       tri_u_ref, tri_l_ref,
                       fx_ref, mx_ref, fd_ref, md_ref, *refs):
    w_refs = refs[:N_PACKED]
    out_ref = refs[N_PACKED]
    w_out_ref = refs[N_PACKED + 1]
    acc_refs = refs[N_PACKED + 2:]          # grad outputs double as accums
    consts_n = (fx_ref[:], mx_ref[:], fd_ref[:], md_ref[:])
    ws_ = [r[:] for r in w_refs]

    rays = rays_ref[:]
    z = z_ref[:]
    noise = noise_ref[:]
    p8, d8 = _build_points(rays, z)
    fwd = _forward_body(p8, d8, consts_n, ws_, keep_acts=True)
    sigma8, rgb8 = fwd[0], fwd[1]
    sigmas = sigma8[:, 0:1].reshape(R_TILE, S)
    rgb_planes = [rgb8[:, c:c + 1].reshape(R_TILE, S) for c in range(3)]
    deltas, s_eff, exp_neg, trans, weights, opacity, rgb, depth = \
        _quad_forward(rays, z, noise, sigmas, tri_u_ref[:],
                      bool(white_back), rgb_planes)

    out_ref[:, 0:3] = rgb
    out_ref[:, 3:4] = depth
    out_ref[:, 4:5] = opacity
    out_ref[:, 5:8] = jnp.zeros_like(out_ref[:, 5:8])
    w_out_ref[:] = weights

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in acc_refs:
            r[:] = jnp.zeros_like(r)

    # MSE cotangent, in-kernel: dL/drgb = 2*(rgb - gt)*scale
    g_rgb = [(2.0 * scale) * (rgb[:, c:c + 1] - gt_ref[:, c:c + 1])
             for c in range(3)]

    # a_k = dL/dw_k (depth/opacity/weights carry no loss here)
    a = g_rgb[0] * rgb_planes[0]
    for c in (1, 2):
        a = a + g_rgb[c] * rgb_planes[c]
    if white_back:
        a = a - (g_rgb[0] + g_rgb[1] + g_rgb[2])

    aw = a * weights
    suffix = jax.lax.dot(aw, tri_l_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
    d_optical = a * trans * exp_neg - suffix
    d_sigma = jnp.where(s_eff > 0, d_optical * deltas, 0.0)

    g_sig_plane = d_sigma[..., None]
    zeros7 = jnp.zeros((R_TILE, S, 7), jnp.float32)
    g_sigma8 = jnp.concatenate([g_sig_plane, zeros7],
                               axis=-1).reshape(R_TILE * S, 8)
    g_rgb_planes = [(weights * g_rgb[c])[..., None] for c in range(3)]
    zeros5 = jnp.zeros((R_TILE, S, 5), jnp.float32)
    g_rgb8 = jnp.concatenate(g_rgb_planes + [zeros5],
                             axis=-1).reshape(R_TILE * S, 8)

    _mlp_grads(p8, d8, ws_, fwd, g_rgb8, g_sigma8, acc_refs)


def fused_mse_render(packed, rays, z_vals, noise, gt8,
                     white_back: bool, scale: float,
                     points_per_tile: int = 4096):
    """One-kernel fwd+bwd MSE step for ONE NeRF model on a ray batch.

    Args:
      packed: pack_params(model_params) (f32 master copies).
      rays: (R, 8).  z_vals: (R, S) sorted depths.  noise: (R, S).
      gt8: (R, 8) ground-truth rgb in cols 0..2 (cols 3..7 ignored).
      scale: cotangent scale — 1/(R_global*3) for a mean over the GLOBAL
        batch (pass the global size under shard_map data parallelism).

    Returns (out8 (R, 8) [rgb, depth, opacity], weights (R, S),
             grads: N_PACKED tuple matching pack_params layout — feed to
             fused_mlp.unpack_grads). NOT differentiable — the gradients ARE
        the output; use from a hand-assembled train step.
    """
    R, S = z_vals.shape
    r_tile = _r_tile(points_per_tile, S, R)
    tri_u = _strict_upper(S)
    tri_l = _strict_lower(S)
    kernel = functools.partial(_mse_fwdbwd_kernel, int(white_back), S,
                               r_tile, float(scale))
    in_specs = (_ray_tile_specs(r_tile, S, n_extra8=1)      # rays,z,noise,gt
                + [_const_block(tri_u), _const_block(tri_l)]
                + [_const_block(c) for c in _consts()]
                + [_const_block(w) for w in packed])
    out_shapes = ((jax.ShapeDtypeStruct((R, 8), jnp.float32),
                   jax.ShapeDtypeStruct((R, S), jnp.float32))
                  + tuple(jax.ShapeDtypeStruct(p.shape, jnp.float32)
                          for p in packed))
    out_specs = ((pl.BlockSpec((r_tile, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((r_tile, S), lambda i: (i, 0),
                               memory_space=pltpu.VMEM))
                 + tuple(_const_block(p) for p in packed))
    out = pl.pallas_call(
        kernel,
        grid=(R // r_tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
        compiler_params=_VMEM_LIMIT,
    )(rays, z_vals, noise, gt8, tri_u, tri_l, *_consts(), *_precast(packed))
    out8, weights = out[0], out[1]
    return out8, weights, tuple(out[2:])
