"""Learning-rate schedules: steplr / cosine / poly, with gradual warmup.

Parity: reference utils/__init__.py:32-49 + utils/warmup_scheduler.py — decay
is computed from the *epoch* index (README.md:192: per-epoch decay), derived
here from the step count with a static steps_per_epoch, so the whole schedule
is a pure step -> lr function usable inside a jitted optax update. (The
reference's poly branch crashes on a missing import, utils/__init__.py:40;
here it works.)

Warmup follows GradualWarmupScheduler (warmup_scheduler.py:23-32): scale
ramps 1 -> multiplier over warmup_epochs, after which the base schedule runs
with its lr scaled by multiplier — and, like the reference
(utils/__init__.py:45), warmup applies only to sgd/adam.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np


def get_lr_schedule(lr_scheduler: str,
                    lr: float,
                    num_epochs: int,
                    steps_per_epoch: int,
                    decay_step: Sequence[int] = (20,),
                    decay_gamma: float = 0.1,
                    poly_exp: float = 0.9,
                    warmup_multiplier: float = 1.0,
                    warmup_epochs: int = 0,
                    optimizer: str = "adam",
                    eps: float = 1e-8) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Returns a step -> lr function (jit-traceable)."""
    milestones = np.asarray(sorted(decay_step), dtype=np.float32)

    def base_scale(epoch):
        if lr_scheduler == "steplr":
            # MultiStepLR: gamma^(#milestones reached by this epoch).
            n_passed = jnp.sum((milestones <= epoch).astype(jnp.float32))
            return decay_gamma ** n_passed
        if lr_scheduler == "cosine":
            # torch CosineAnnealingLR with T_max=num_epochs, eta_min=eps
            cos = 0.5 * (1 + jnp.cos(jnp.pi * epoch / num_epochs))
            return (eps + (lr - eps) * cos) / lr
        if lr_scheduler == "poly":
            frac = jnp.clip(1.0 - epoch / num_epochs, 0.0, 1.0)
            return frac ** poly_exp
        raise ValueError(f"scheduler not recognized: {lr_scheduler!r}")

    use_warmup = warmup_epochs > 0 and optimizer in ("sgd", "adam")

    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) / steps_per_epoch
        if not use_warmup:
            return lr * base_scale(epoch)
        ramp = (warmup_multiplier - 1.0) * jnp.minimum(
            epoch / warmup_epochs, 1.0) + 1.0
        after = warmup_multiplier * base_scale(
            jnp.maximum(epoch - warmup_epochs, 0.0))
        return lr * jnp.where(epoch <= warmup_epochs, ramp, after)

    return schedule
