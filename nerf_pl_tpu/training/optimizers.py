"""Optimizer zoo on optax: sgd / adam / radam / ranger.

Parity: reference utils/__init__.py:10-30 + utils/optimizers.py — eps=1e-8,
torch-style coupled L2 weight decay (added to the gradient before the moment
update, like torch.optim.Adam(weight_decay=...)), RAdam with the rectification
threshold, and Ranger = RAdam + Lookahead(alpha=0.5, k=6). Lookahead is a
self-contained GradientTransformation keeping the slow weights in optimizer
state, so the train step stays a single pytree update (no wrapper params).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax

ScalarOrSchedule = Union[float, Callable[[jnp.ndarray], jnp.ndarray]]


class LookaheadState(NamedTuple):
    inner: Any
    slow: Any
    count: jnp.ndarray


def lookahead(inner: optax.GradientTransformation,
              sync_period: int = 6,
              slow_step_size: float = 0.5) -> optax.GradientTransformation:
    """Lookahead (Zhang et al. 2019) over an inner optimizer.

    Every `sync_period` steps the slow weights move `slow_step_size` toward
    the fast weights and the fast weights reset to the slow weights —
    matching the reference Ranger's buffered slow weights
    (utils/optimizers.py:266-405)."""

    def init_fn(params):
        return LookaheadState(inner=inner.init(params),
                              slow=jax.tree_util.tree_map(jnp.asarray, params),
                              count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("lookahead requires params")
        u, inner_state = inner.update(updates, state.inner, params)
        fast_new = jax.tree_util.tree_map(lambda p, du: p + du, params, u)
        count = state.count + 1
        sync = (count % sync_period) == 0

        def lerp(s, f):
            return s + slow_step_size * (f - s)

        slow_new = jax.tree_util.tree_map(
            lambda s, f: jnp.where(sync, lerp(s, f), s), state.slow, fast_new)
        final_updates = jax.tree_util.tree_map(
            lambda du, s_new, p: jnp.where(sync, s_new - p, du),
            u, slow_new, params)
        return final_updates, LookaheadState(inner_state, slow_new, count)

    return optax.GradientTransformation(init_fn, update_fn)


def _maybe_l2(weight_decay: float):
    """torch-style coupled L2: grad += wd * param, applied pre-moments."""
    if weight_decay and weight_decay > 0:
        return [optax.add_decayed_weights(weight_decay)]
    return []


def get_optimizer(name: str,
                  learning_rate: ScalarOrSchedule,
                  momentum: float = 0.9,
                  weight_decay: float = 0.0,
                  eps: float = 1e-8) -> optax.GradientTransformation:
    """Build the optimizer named by the --optimizer flag.

    `learning_rate` may be a float or a per-step schedule (step -> lr)."""
    if name == "sgd":
        return optax.chain(
            *_maybe_l2(weight_decay),
            optax.trace(decay=momentum, nesterov=False),
            optax.scale_by_learning_rate(learning_rate),
        )
    if name == "adam":
        return optax.chain(
            *_maybe_l2(weight_decay),
            optax.scale_by_adam(eps=eps),
            optax.scale_by_learning_rate(learning_rate),
        )
    if name == "radam":
        return optax.chain(
            *_maybe_l2(weight_decay),
            optax.scale_by_radam(eps=eps),
            optax.scale_by_learning_rate(learning_rate),
        )
    if name == "ranger":
        # Reference Ranger defaults differ from RAdam's: betas=(0.95, 0.999),
        # eps=1e-5 (utils/optimizers.py:268).
        inner = optax.chain(
            *_maybe_l2(weight_decay),
            optax.scale_by_radam(b1=0.95, b2=0.999, eps=1e-5),
            optax.scale_by_learning_rate(learning_rate),
        )
        return lookahead(inner, sync_period=6, slow_step_size=0.5)
    raise ValueError(f"optimizer not recognized: {name!r}")
