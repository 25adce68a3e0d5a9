"""The NeRF MLP as a pure function over a parameter pytree.

Architecture parity with the reference (models/nerf.py:41-123): an 8x256
density trunk with a skip-concat of the embedded position at layer 4, a sigma
head off the trunk, a 256-wide feature layer feeding a 128-wide view-dependent
branch, and a sigmoid RGB head. `sigma_only` skips the view branch (used for
test-time coarse passes and sigma-grid mesh queries).

TPU-first notes:
  * Parameters are a flat dict of {name: {'w','b'}} — transparent for partial
    checkpoint loading (prefix filtering), for tensor-parallel sharding
    annotations, and for handing raw weight matrices to the fused Pallas
    point-MLP kernel (ops/fused_mlp.py).
  * All heavy math is (..., K) @ (K, N) matmuls that XLA tiles onto the MXU;
    `compute_dtype` lets the caller run the trunk in bfloat16 with float32
    accumulation (preferred_element_type) for ~2x MXU throughput.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Dict[str, jnp.ndarray]]


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    """Static NeRF MLP hyperparameters (hashable: safe as a jit static arg)."""
    D: int = 8
    W: int = 256
    in_channels_xyz: int = 63   # 3 + 3*10*2
    in_channels_dir: int = 27   # 3 + 3*4*2
    skips: Tuple[int, ...] = (4,)

    def layer_dims(self):
        """[(in, out)] for the D trunk layers."""
        dims = []
        for i in range(self.D):
            if i == 0:
                dims.append((self.in_channels_xyz, self.W))
            elif i in self.skips:
                dims.append((self.W + self.in_channels_xyz, self.W))
            else:
                dims.append((self.W, self.W))
        return dims


def _init_linear(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    for both weight and bias (kaiming_uniform(a=sqrt(5)) reduces to this)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / (fan_in ** 0.5)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def init_nerf_params(key: jax.Array, cfg: NeRFConfig = NeRFConfig(),
                     dtype=jnp.float32) -> Params:
    """Initialize one NeRF MLP's parameters.

    Layer names: xyz_0..xyz_{D-1} (trunk), xyz_final (feature), dir (view
    branch), sigma, rgb — mirroring the reference's module names
    (models/nerf.py:60-81) so checkpoints are self-describing.
    """
    n_layers = cfg.D + 4
    keys = jax.random.split(key, n_layers)
    params: Params = {}
    for i, (fi, fo) in enumerate(cfg.layer_dims()):
        params[f"xyz_{i}"] = _init_linear(keys[i], fi, fo, dtype)
    params["xyz_final"] = _init_linear(keys[cfg.D], cfg.W, cfg.W, dtype)
    params["dir"] = _init_linear(
        keys[cfg.D + 1], cfg.W + cfg.in_channels_dir, cfg.W // 2, dtype)
    params["sigma"] = _init_linear(keys[cfg.D + 2], cfg.W, 1, dtype)
    params["rgb"] = _init_linear(keys[cfg.D + 3], cfg.W // 2, 3, dtype)
    return params


def nerf_param_count(cfg: NeRFConfig = NeRFConfig()) -> int:
    n = 0
    for fi, fo in cfg.layer_dims():
        n += fi * fo + fo
    n += cfg.W * cfg.W + cfg.W                                   # xyz_final
    n += (cfg.W + cfg.in_channels_dir) * (cfg.W // 2) + cfg.W // 2  # dir
    n += cfg.W + 1                                               # sigma
    n += (cfg.W // 2) * 3 + 3                                    # rgb
    return n


def _linear(p, x, compute_dtype):
    w = p["w"].astype(compute_dtype)
    return jnp.dot(x.astype(compute_dtype), w,
                   preferred_element_type=jnp.float32) + p["b"]


def nerf_apply(params: Params,
               xyz_emb: jnp.ndarray,
               dir_emb: Optional[jnp.ndarray] = None,
               cfg: NeRFConfig = NeRFConfig(),
               sigma_only: bool = False,
               compute_dtype: Any = jnp.float32):
    """Apply the NeRF MLP to embedded points.

    Args:
      xyz_emb: (..., in_channels_xyz) embedded positions.
      dir_emb: (..., in_channels_dir) embedded view directions (None iff
        sigma_only). Unlike the reference (which repeat_interleaves the dir
        embedding to a flat point list, rendering.py:119), broadcasting is
        handled by the caller — inputs keep their natural (rays, samples, C)
        shape and XLA broadcasts without materialization.
      sigma_only: skip the view-dependent branch (reference nerf.py:83-114).

    Returns:
      sigma (..., 1) if sigma_only else (rgb (..., 3), sigma (..., 1)).
      sigma is the raw (pre-ReLU) density; rgb is post-sigmoid.
    """
    h = xyz_emb
    for i in range(cfg.D):
        if i in cfg.skips:
            h = jnp.concatenate([xyz_emb, h], axis=-1)
        h = jax.nn.relu(_linear(params[f"xyz_{i}"], h, compute_dtype))
    sigma = _linear(params["sigma"], h, compute_dtype)
    if sigma_only:
        return sigma

    feat = _linear(params["xyz_final"], h, compute_dtype)
    hdir = jnp.concatenate(
        [feat, jnp.broadcast_to(dir_emb, feat.shape[:-1] + dir_emb.shape[-1:])],
        axis=-1)
    hdir = jax.nn.relu(_linear(params["dir"], hdir, compute_dtype))
    rgb = jax.nn.sigmoid(_linear(params["rgb"], hdir, compute_dtype))
    return rgb, sigma
