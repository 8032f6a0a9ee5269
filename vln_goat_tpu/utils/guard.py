"""Numerical failure guards.

The reference has no sanitizers on the live path (SURVEY.md section 5: the
fairseq nan_detector is dead code; its guardrails are grad clipping and a
NaN-ignoring meter).  TPU-native upgrade: a jit-compatible finite-update
guard — when a step produces non-finite grads the update is skipped and a
counter increments, so a single bad batch can't poison training.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def finite_guard(tx: optax.GradientTransformation,
                 max_consecutive_errors: int = 10):
    """Wrap an optimizer so non-finite updates are dropped
    (optax.apply_if_finite)."""
    return optax.apply_if_finite(tx, max_consecutive_errors)


def grad_finite_fraction(grads) -> jnp.ndarray:
    """Fraction of finite gradient entries (diagnostic scalar)."""
    leaves = jax.tree.leaves(grads)
    tot = sum(x.size for x in leaves)
    fin = sum(jnp.sum(jnp.isfinite(x)) for x in leaves)
    return fin / tot


def notfinite_count(opt_state) -> jnp.ndarray:
    """Skipped-update counter from an apply_if_finite state."""
    return opt_state.notfinite_count
