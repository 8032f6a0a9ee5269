"""Mask utilities.

Parity notes (reference map_nav_src/models/ops.py):
- extend_neg_masks (:25) converts a boolean [B, L] mask into an additive
  float mask [B, 1, 1, L] of 0 / -10000 (NOT -inf) — GOAT checkpoints were
  trained with -10000, so we reproduce it exactly.
- gen_seq_masks (:36) builds [B, L] boolean masks from lengths.
"""
from __future__ import annotations

import jax.numpy as jnp

NEG_INF_MASK_VALUE = -10000.0


def gen_seq_masks(seq_lens: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] bool. max_len must be static under jit."""
    pos = jnp.arange(max_len)[None, :]
    return pos < seq_lens[:, None]


def extend_neg_masks(masks: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, L] bool/float -> [B, 1, 1, L] additive mask (0 keep / -10000 drop)."""
    m = masks.astype(dtype)
    return (1.0 - m)[:, None, None, :] * NEG_INF_MASK_VALUE
