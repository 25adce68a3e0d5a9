"""Fully-fused inference renderer: ray->points->embed->MLP->quadrature in
one Pallas kernel, per ray tile.

Why: at full-image scale (800x800 x 192 samples = 123M points) even the
fused point-MLP moves ~8 GB/frame of per-POINT data through HBM (xyz/dir
inputs + rgbsigma outputs). This kernel keeps the whole per-point world in
VMEM: each grid step takes R_TILE rays (R_TILE x 8 floats) + their sample
depths (R_TILE x S), generates the sample positions in-kernel, runs the
fused MLP, and integrates the quadrature down to per-RAY outputs
(R_TILE x [rgb, depth, opacity]) — HBM traffic is per-ray only.

TPU tricks:
  * points tensor built as (R_TILE*S, 8) by a reshape of
    o + d*z (R_TILE, S, 3) — rays stay grouped so the flatten is a pure
    sublane merge;
  * the exclusive cumulative sum for transmittance runs on the MXU as a
    matmul with a strictly-upper-triangular ones matrix (no scan);
  * weighted RGB/depth sums are lane reductions per ray.

Inference only (test-time eval / validation); training keeps the point-MLP
custom-VJP kernel. Quadrature math parity: rendering/render.py
volume_quadrature (reference models/rendering.py:144-170).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import (_cast, _const_block, _consts, _dot, _embed_sincos,
                        _interpret, _precast, _VMEM_LIMIT, D, IN_P,
                        SKIP_LAYER, pack_params)


def _build_points(rays, z):
    """rays (R, 8), z (R, S) -> p8 (R*S, IN_P), d8 (R*S, IN_P).

    Built as (R, S, IN_P) then flattened to (R*S, IN_P) — the one reshape
    form Mosaic supports here (merging leading dims); a direct
    (R, S) -> (R*S, 1) lane-to-sublane cast is rejected by the layout
    inference."""
    R, S = z.shape
    planes_p, planes_d = [], []
    for c in range(3):
        o_c = rays[:, c:c + 1]
        d_c = rays[:, 3 + c:4 + c]
        planes_p.append((o_c + d_c * z)[..., None])           # (R, S, 1)
        planes_d.append(jnp.broadcast_to(d_c, (R, S))[..., None])
    zero = jnp.zeros((R, S, IN_P - 3), z.dtype)
    p3 = jnp.concatenate(planes_p + [zero], axis=-1)          # (R, S, 8)
    d3 = jnp.concatenate(planes_d + [zero], axis=-1)
    return p3.reshape(R * S, IN_P), d3.reshape(R * S, IN_P)


def _quadrature_tile(sigmas, rgb_planes, z, dir_norm, white_back, tri):
    """Per-tile quadrature. sigmas (R, S), rgb_planes: list of 3 (R, S)
    channel planes or None, z (R, S), dir_norm (R, 1), tri (S, S)
    strictly-upper ones matrix."""
    deltas = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full_like(z[:, :1], 1e10)],
        axis=-1) * dir_norm
    optical = deltas * jnp.maximum(sigmas, 0.0)            # delta * relu(s)
    alphas = 1.0 - jnp.exp(-optical)
    # log(1 - alpha) == -optical exactly — no exp->log roundtrip (which
    # also NaNs in pallas interpret for log(1e-10)). The reference's
    # +1e-10 cumprod epsilon only leaks ~1e-10 weight behind opaque
    # samples; omitted here (difference far below fp32 rendering noise).
    # Exclusive cumsum along S via MXU: out[:, i] = sum_{j<i} v[:, j].
    # HIGHEST: TPU f32 dots default to one bf16 MXU pass; these sums feed
    # exp() where the rounding visibly corrupts transmittance.
    csum = jax.lax.dot(-optical, tri, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    weights = alphas * jnp.exp(csum)                       # (R, S)
    opacity = jnp.sum(weights, axis=-1, keepdims=True)     # (R, 1)
    if rgb_planes is None:
        return weights, opacity, None, None
    rgb = jnp.concatenate(
        [jnp.sum(weights * pc, axis=-1, keepdims=True) for pc in rgb_planes],
        axis=-1)                                           # (R, 3)
    depth = jnp.sum(weights * z, axis=-1, keepdims=True)
    if white_back:
        rgb = rgb + (1.0 - opacity)
    return weights, opacity, rgb, depth


def _render_kernel(white_back: int, S: int, R_TILE: int,
                   rays_ref, z_ref, tri_ref, fx_ref, mx_ref, fd_ref, md_ref,
                   *refs):
    *w_refs, out_ref = refs
    consts_n = (fx_ref[:], mx_ref[:], fd_ref[:], md_ref[:])
    ws_ = [r[:] for r in w_refs]
    from .fused_mlp import _forward_body

    rays = rays_ref[:]
    z = z_ref[:]
    p8, d8 = _build_points(rays, z)
    sigma8, rgb8, *_ = _forward_body(p8, d8, consts_n, ws_, keep_acts=False)
    sigmas = sigma8[:, 0:1].reshape(R_TILE, S)
    rgb_planes = [rgb8[:, c:c + 1].reshape(R_TILE, S) for c in range(3)]
    dir_norm = jnp.sqrt(jnp.sum(rays[:, 3:6] ** 2, axis=-1, keepdims=True))
    _, opacity, rgb, depth = _quadrature_tile(
        sigmas, rgb_planes, z, dir_norm, bool(white_back), tri_ref[:])
    out_ref[:, 0:3] = rgb
    out_ref[:, 3:4] = depth
    out_ref[:, 4:5] = opacity
    out_ref[:, 5:8] = jnp.zeros_like(out_ref[:, 5:8])


def _sigma_render_kernel(S: int, R_TILE: int,
                         rays_ref, z_ref, tri_ref, fx_ref, mx_ref, *refs):
    """sigma-only variant: outputs per-ray weights (for sample_pdf) packed
    as (R_TILE, S) plus opacity in a second output."""
    *w_refs, w_out_ref, o_out_ref = refs
    (Fx, mx) = (fx_ref[:], mx_ref[:])
    (w0r, w0e, wskr, wske, wt, bt, ws, bs) = [r[:] for r in w_refs]
    rays = rays_ref[:]
    z = z_ref[:]
    p8, _ = _build_points(rays, z)
    ex = _cast(_embed_sincos(p8, Fx, mx))
    h = _cast(jnp.maximum(_dot(p8, w0r) + _dot(ex, w0e) + bt[0][None], 0.0))
    skip = _dot(p8, wskr) + _dot(ex, wske)
    for i in range(1, D):
        t = _dot(h, wt[i - 1]) + bt[i][None]
        if i == SKIP_LAYER:
            t = t + skip
        h = _cast(jnp.maximum(t, 0.0))
    sigma8 = _dot(h, ws) + bs
    sigmas = sigma8[:, 0:1].reshape(R_TILE, S)
    dir_norm = jnp.sqrt(jnp.sum(rays[:, 3:6] ** 2, axis=-1, keepdims=True))
    weights, opacity, _, _ = _quadrature_tile(
        sigmas, None, z, dir_norm, False, tri_ref[:])
    w_out_ref[:] = weights
    o_out_ref[:, 0:1] = opacity
    o_out_ref[:, 1:8] = jnp.zeros_like(o_out_ref[:, 1:8])


def _strict_upper(S: int) -> jnp.ndarray:
    return jnp.asarray(np.triu(np.ones((S, S), np.float32), k=1))


def _ray_specs(R_TILE, S):
    return [pl.BlockSpec((R_TILE, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_TILE, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)]


def fused_render_eval(params: Dict, rays: jnp.ndarray, z_vals: jnp.ndarray,
                      white_back: bool, points_per_tile: int = 1024):
    """Fused full-path inference render.

    Args:
      rays: (R, 8). z_vals: (R, S) sorted sample depths. R % R_TILE == 0
        is handled by padding internally.

    Returns dict rgb (R, 3), depth (R,), opacity (R,).
    """
    R, S = z_vals.shape
    # sublane rule: ray-tile must be a multiple of 8
    r_tile = max((points_per_tile // S) // 8 * 8, 8)
    pad = (-R) % r_tile
    if pad:
        rays = jnp.concatenate(
            [rays, jnp.broadcast_to(rays[-1:], (pad, 8))], 0)
        z_vals = jnp.concatenate(
            [z_vals, jnp.broadcast_to(z_vals[-1:], (pad, S))], 0)
    Rp = R + pad
    packed = _precast(pack_params(params))
    tri = _strict_upper(S)
    kernel = functools.partial(_render_kernel, int(white_back), S, r_tile)
    in_specs = (_ray_specs(r_tile, S)
                + [_const_block(tri)]
                + [_const_block(c) for c in _consts()]
                + [_const_block(w) for w in packed])
    out = pl.pallas_call(
        kernel,
        grid=(Rp // r_tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((r_tile, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, 8), jnp.float32),
        interpret=_interpret(),
        compiler_params=_VMEM_LIMIT,
    )(rays, z_vals, tri, *_consts(), *packed)
    return {"rgb": out[:R, 0:3], "depth": out[:R, 3],
            "opacity": out[:R, 4]}


def fused_sigma_render(params: Dict, rays: jnp.ndarray, z_vals: jnp.ndarray,
                       points_per_tile: int = 1024):
    """Fused sigma-only inference: per-ray quadrature weights + opacity.

    Returns (weights (R, S), opacity (R,))."""
    R, S = z_vals.shape
    # sublane rule: ray-tile must be a multiple of 8
    r_tile = max((points_per_tile // S) // 8 * 8, 8)
    pad = (-R) % r_tile
    if pad:
        rays = jnp.concatenate(
            [rays, jnp.broadcast_to(rays[-1:], (pad, 8))], 0)
        z_vals = jnp.concatenate(
            [z_vals, jnp.broadcast_to(z_vals[-1:], (pad, S))], 0)
    Rp = R + pad
    packed = _precast(pack_params(params))
    sub = (packed[0], packed[1], packed[2], packed[3], packed[4],
           packed[5], packed[12], packed[13])
    tri = _strict_upper(S)
    Fx, mx = _consts()[:2]
    kernel = functools.partial(_sigma_render_kernel, S, r_tile)
    in_specs = (_ray_specs(r_tile, S)
                + [_const_block(tri), _const_block(Fx), _const_block(mx)]
                + [_const_block(w) for w in sub])
    weights, op = pl.pallas_call(
        kernel,
        grid=(Rp // r_tile,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((r_tile, S), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((r_tile, 8), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((Rp, S), jnp.float32),
                   jax.ShapeDtypeStruct((Rp, 8), jnp.float32)),
        interpret=_interpret(),
        compiler_params=_VMEM_LIMIT,
    )(rays, z_vals, tri, Fx, mx, *sub)
    return weights[:R], op[:R, 0]
