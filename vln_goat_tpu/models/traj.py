"""Trajectory-level helpers shared by pre-training and CFP extraction."""
from __future__ import annotations

import jax.numpy as jnp
import jax


def aggregate_gmap_features(pano_embeds, pano_fused, gmap_visited_step,
                            cand_to_gmap, num_gmap_tokens: int):
    """Vectorized _aggregate_gmap_features (pretrain vilmodel_goat.py:430-468
    / fine-tune vilmodel_GOAT.py:406-452 with seperate_his=False).

    pano_embeds [B, T, Lp, D]; pano_fused [B, T, D] (node embedding of each
    visited step); gmap_visited_step [B, G]: step whose fused embedding
    represents a visited-node token (-1 for unvisited/pad); cand_to_gmap
    [B, T, K]: gmap slot receiving candidate occurrence (t, k) of a
    never-visited node (-1 otherwise).  Slot 0 ([stop]) is zeros.
    """
    B, T, Lp, D = pano_embeds.shape
    K = cand_to_gmap.shape[2]
    G = num_gmap_tokens
    bidx = jnp.arange(B)

    vstep = gmap_visited_step
    visited_part = pano_fused[bidx[:, None], jnp.maximum(vstep, 0)]
    visited_part = jnp.where((vstep >= 0)[..., None], visited_part, 0.0)

    c2g = cand_to_gmap.reshape(B, T * K)
    valid = c2g >= 0
    tgt = jnp.where(valid, c2g, G)          # trash slot G
    contrib = pano_embeds[:, :, :K, :].reshape(B, T * K, D)
    acc = jnp.zeros((B, G + 1, D)).at[bidx[:, None], tgt].add(
        jnp.where(valid[..., None], contrib, 0.0))[:, :G]
    cnt = jnp.zeros((B, G + 1)).at[bidx[:, None], tgt].add(
        valid.astype(jnp.float32))[:, :G]
    unvisited_part = acc / jnp.maximum(cnt, 1.0)[..., None]

    gmap_img = jnp.where((vstep >= 0)[..., None], visited_part, unvisited_part)
    return gmap_img.at[:, 0].set(0.0)
