"""Optimizer variants from the reference pretrain stack
(pretrain_src/optim/: adam / adamax / adamw / radam / ralamb / lookahead /
rangerlars; registry optim/misc.py:24-33), rebuilt as optax
GradientTransformations.

- radam: optax.radam (rectified Adam, optim/radam.py).
- ralamb: RAdam with a per-parameter LARS trust ratio
  ||p|| / ||update|| (optim/ralamb.py:60-76 — weight norm clamped to
  [0, 10], ratio 1 when either norm is 0).
- lookahead(base, alpha, k): slow weights synced every k steps
  (optim/lookahead.py:12-53), expressed as a transformation that carries
  the slow copy in the optimizer state.
- rangerlars = lookahead(ralamb) (optim/rangerlars.py:12).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def lars_trust(base: optax.GradientTransformation,
               clamp: float = 10.0) -> optax.GradientTransformation:
    """Scale each parameter's update by ||p|| / ||u|| (Ralamb trust)."""

    def init(params):
        return base.init(params)

    def update(grads, state, params=None):
        updates, state = base.update(grads, state, params)

        def scale(u, p):
            wn = jnp.clip(jnp.linalg.norm(p.astype(jnp.float32)), 0.0, clamp)
            un = jnp.linalg.norm(u.astype(jnp.float32))
            trust = jnp.where((wn > 0) & (un > 0), wn / jnp.maximum(un, 1e-12),
                              1.0)
            return u * trust.astype(u.dtype)

        return jax.tree.map(scale, updates, params), state

    return optax.GradientTransformation(init, update)


class LookaheadState(NamedTuple):
    base: object
    slow: object
    step: jnp.ndarray


def lookahead(base: optax.GradientTransformation, alpha: float = 0.5,
              k: int = 6) -> optax.GradientTransformation:
    """Every k fast steps, pull the fast weights toward the slow copy:
    p_new = slow + alpha * (fast - slow), slow := p_new."""

    def init(params):
        return LookaheadState(base.init(params),
                              jax.tree.map(jnp.asarray, params),
                              jnp.zeros((), jnp.int32))

    def update(grads, state, params=None):
        assert params is not None, "lookahead needs params"
        updates, bstate = base.update(grads, state.base, params)
        fast = optax.apply_updates(params, updates)
        step = state.step + 1
        sync = (step % k == 0)

        def mix(f, s):
            new_p = jnp.where(sync, s + alpha * (f - s), f)
            return new_p

        new_params = jax.tree.map(mix, fast, state.slow)
        new_slow = jax.tree.map(
            lambda s, np_: jnp.where(sync, np_, s), state.slow, new_params)
        total = jax.tree.map(lambda np_, p: np_ - p, new_params, params)
        return total, LookaheadState(bstate, new_slow, step)

    return optax.GradientTransformation(init, update)


def ralamb(lr, b1=0.9, b2=0.999, eps=1e-8,
           weight_decay: float = 0.0) -> optax.GradientTransformation:
    base = optax.radam(lr, b1=b1, b2=b2, eps=eps)
    if weight_decay:
        base = optax.chain(optax.add_decayed_weights(weight_decay), base)
    return lars_trust(base)


def rangerlars(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay: float = 0.0,
               alpha: float = 0.5, k: int = 6
               ) -> optax.GradientTransformation:
    return lookahead(ralamb(lr, b1, b2, eps, weight_decay), alpha=alpha, k=k)


def build_optimizer(name: str, lr, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay: float = 0.01,
                    decay_mask=None) -> optax.GradientTransformation:
    """optim/misc.py:24-33 registry (plus radam/ralamb, shipped but unused
    by the GOAT configs)."""
    name = name.lower()
    if name == "adam":
        return optax.adam(lr, b1=b1, b2=b2, eps=eps)
    if name == "adamax":
        return optax.adamax(lr, b1=b1, b2=b2, eps=eps)
    if name == "adamw":
        return optax.adamw(lr, b1=b1, b2=b2, eps=eps,
                           weight_decay=weight_decay, mask=decay_mask)
    if name == "radam":
        return optax.radam(lr, b1=b1, b2=b2, eps=eps)
    if name == "ralamb":
        return ralamb(lr, b1, b2, eps, weight_decay)
    if name == "rangerlars":
        return rangerlars(lr, b1, b2, eps, weight_decay)
    raise ValueError(f"invalid optimizer {name}")
