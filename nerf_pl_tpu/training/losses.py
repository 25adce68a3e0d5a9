"""Training losses. Parity: reference losses.py:4-17 — mean-squared error on
the coarse RGB plus (when the hierarchical pass runs) the fine RGB, summed."""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def mse_loss(results: Dict[str, jnp.ndarray], rgbs: jnp.ndarray) -> jnp.ndarray:
    loss = jnp.mean((results["rgb_coarse"] - rgbs) ** 2)
    if "rgb_fine" in results:
        loss = loss + jnp.mean((results["rgb_fine"] - rgbs) ** 2)
    return loss


loss_dict = {"mse": mse_loss}
