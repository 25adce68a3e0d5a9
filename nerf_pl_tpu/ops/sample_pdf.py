"""Hierarchical (inverse-CDF) importance sampling — TPU-native.

Replaces the reference's single native dependency, the torchsearchsorted
CUDA extension (SURVEY.md C5; consumed at reference models/rendering.py:2,42).

On TPU, a branchy per-query binary search is the wrong shape: with only
N_samples ~ 64 bins per ray, a *comparison-matrix* formulation — counting
`cdf <= u` across the bin axis — is a single fused VPU pass over a
(rays, N_importance, N_bins) broadcast, with no data-dependent control flow,
no gather/scatter serialization, and trivially batched. XLA fuses the
broadcast-compare-reduce into one kernel; the subsequent bin gathers use
one-hot matmuls when lowering favors the MXU, or vectorized dynamic-gathers
otherwise — both static-shape.

Semantics parity (reference rendering.py:14-55):
  * weights += eps, normalized to a pdf, exclusive-zero-padded cdf,
  * u ~ U[0,1) (stratified path) or linspace(0,1) (deterministic path),
  * side='right' searchsorted, clamp below/above, linear interp inside the
    bin, zero-width bins get denom=1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def searchsorted_right(sorted_seq: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Batched row-wise searchsorted with side='right'.

    Args:
      sorted_seq: (..., N) ascending per row.
      values: (..., M) query values.

    Returns: (..., M) int32 insertion indices in [0, N]: the count of entries
    in the row that are <= the query (identical to the CUDA extension's
    side='right' contract).
    """
    # (..., M, N) comparison matrix -> count along N. Pure VPU, no branches.
    cmp = sorted_seq[..., None, :] <= values[..., :, None]
    return jnp.sum(cmp.astype(jnp.int32), axis=-1)


def sample_pdf(bins: jnp.ndarray,
               weights: jnp.ndarray,
               N_importance: int,
               det: bool,
               key: jax.Array | None = None,
               eps: float = 1e-5,
               u: jnp.ndarray | None = None) -> jnp.ndarray:
    """Draw N_importance samples per ray from the piecewise-constant pdf.

    Args:
      bins: (N_rays, N_bins+1) bin edges (the coarse z midpoints).
      weights: (N_rays, N_bins) unnormalized bin weights (coarse weights with
        the two endpoint samples dropped, reference rendering.py:225).
      N_importance: samples to draw per ray.
      det: deterministic (evenly spaced u) vs stratified-uniform u.
      key: PRNG key, required when det=False.
      u: optional explicit (N_rays, N_importance) CDF positions in [0, 1)
        overriding det/key — e.g. per-stratum ascending draws so the output
        is sorted (occupied-segment placement, render.py occupied_z_vals).

    Returns: (N_rays, N_importance) sample positions. Callers should
    stop_gradient the result (reference detaches at rendering.py:225-227).
    """
    N_rays, N_bins = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (R, B+1)

    if u is not None:
        u = jnp.broadcast_to(u.astype(cdf.dtype), (N_rays, N_importance))
    elif det:
        u = jnp.linspace(0.0, 1.0, N_importance, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (N_rays, N_importance))
    else:
        if key is None:
            raise ValueError("sample_pdf(det=False) requires a PRNG key")
        u = jax.random.uniform(key, (N_rays, N_importance), dtype=cdf.dtype)

    # Bracketing WITHOUT gathers: cdf is ascending, so the reference's
    # below/above = searchsorted(cdf, u)-1 / searchsorted(cdf, u) gathers
    # (rendering.py:42-48) reduce to masked max/min over the bin axis —
    # pure VPU compare+reduce, ~10x faster on TPU than take_along_axis.
    mask = cdf[..., None, :] <= u[..., :, None]    # (R, M, B+1)
    neg = jnp.float32(-jnp.inf)
    pos = jnp.float32(jnp.inf)
    cdf_e = cdf[..., None, :]
    bins_e = bins[..., None, :]
    # largest entry with cdf <= u (mask always true at index 0: cdf_0 = 0)
    cdf_b = jnp.max(jnp.where(mask, cdf_e, neg), axis=-1)
    bins_b = jnp.max(jnp.where(mask, bins_e, neg), axis=-1)
    # smallest entry with cdf > u; if none (u >= 1), clamp to the last
    # entry like the reference's above = min(inds, N_bins)
    cdf_a = jnp.min(jnp.where(mask, pos, cdf_e), axis=-1)
    bins_a = jnp.min(jnp.where(mask, pos, bins_e), axis=-1)
    none_above = jnp.isinf(cdf_a)
    cdf_a = jnp.where(none_above, cdf[..., -1:], cdf_a)
    bins_a = jnp.where(none_above, bins[..., -1:], bins_a)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < eps, 1.0, denom)  # zero-weight bin: never hit
    return bins_b + (u - cdf_b) / denom * (bins_a - bins_b)
