"""Sinusoidal positional encoding gamma(x) = (x, sin(2^k x), cos(2^k x), ...).

Pure vectorized jnp function (no module state): the frequency bands are a
compile-time constant folded into the jitted graph, and the per-frequency
Python loop of the reference (models/nerf.py:33-36) becomes a single
broadcasted multiply + sin/cos + reshape, which XLA fuses into one VPU pass.

Parity: reference models/nerf.py:4-38 — identity term included, log- or
linear-spaced bands, and the same (sin, cos) interleaving per frequency so
channel layouts are directly comparable.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EmbeddingConfig:
    """Static embedding hyperparameters (hashable: safe as a jit static arg)."""
    in_channels: int = 3
    N_freqs: int = 10
    logscale: bool = True

    @property
    def out_channels(self) -> int:
        return self.in_channels * (2 * self.N_freqs + 1)

    def freq_bands(self) -> np.ndarray:
        if self.logscale:
            return 2.0 ** np.linspace(0, self.N_freqs - 1, self.N_freqs)
        return np.linspace(1, 2.0 ** (self.N_freqs - 1), self.N_freqs)


def embedding_out_channels(in_channels: int, N_freqs: int) -> int:
    return in_channels * (2 * N_freqs + 1)


def embed(x: jnp.ndarray, cfg: EmbeddingConfig) -> jnp.ndarray:
    """Embed x (..., C) -> (..., C * (2*N_freqs + 1)).

    Output channel order matches the reference's concatenation order:
    [x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...] with each term of
    width C (reference models/nerf.py:33-38).
    """
    freqs = jnp.asarray(cfg.freq_bands(), dtype=x.dtype)  # (F,)
    xb = x[..., None, :] * freqs[:, None]                 # (..., F, C)
    # Interleave sin/cos per frequency: (..., F, 2, C) -> (..., F*2*C).
    sc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)
    sc = sc.reshape(*x.shape[:-1], 2 * cfg.N_freqs * cfg.in_channels)
    return jnp.concatenate([x, sc], axis=-1)
