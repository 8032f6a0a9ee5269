"""Back-translation glue: re-caption augmented paths with the speaker and
feed them to the navigator with shared feature-dropout noise.

Reference: r2r/agent.py:459-474 — in self-train mode the rollout draws one
feature-dropout mask per episode batch, runs speaker.infer_batch under that
mask, swaps the instructions, and reuses the SAME mask for the navigator's
panorama features (already_dropout=True).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..sim.graph_sim import ScanGraph
from .speaker import Speaker, build_path_batch


def shared_drop_mask(rng, feat_dim: int, rate: float) -> jnp.ndarray:
    """One inverted-dropout mask shared across an episode batch
    (vln_bert.drop_env(torch.ones(...)), agent.py:460)."""
    keep = jax.random.bernoulli(rng, 1.0 - rate, (feat_dim,))
    return keep.astype(jnp.float32) / (1.0 - rate)


def backtranslate(speaker: Speaker, params, graphs: Dict[str, ScanGraph],
                  features: np.ndarray, offsets: Dict[str, int],
                  items: Sequence[dict], max_steps: int, rng,
                  feat_drop: float = 0.4, sample: bool = False,
                  angle_feat_size: int = 128,
                  image_feat_size: int = 768) -> tuple:
    """-> (decoded token arrays [B, L], noise [Df]) for the items' gt paths."""
    fb = build_path_batch(graphs, features, offsets, items, max_steps,
                          angle_feat_size=angle_feat_size,
                          image_feat_size=image_feat_size)
    batch = jax.tree.map(jnp.asarray, fb)
    r_noise, r_dec = jax.random.split(rng)
    noise = shared_drop_mask(r_noise, image_feat_size, feat_drop)
    toks = speaker.infer(params, batch, rng=r_dec, sample=sample,
                         featdropmask=noise)
    return np.asarray(toks), np.asarray(noise)


def swap_instructions(items: List[dict], tokens: np.ndarray,
                      eos_id: int, bos_id: int = None) -> List[dict]:
    """Replace each item's instr_encoding with the speaker decode
    (truncated at EOS), keeping ids/paths (agent.py:465-471)."""
    out = []
    for it, row in zip(items, tokens):
        seq = list(row)
        if eos_id in seq:
            seq = seq[:seq.index(eos_id) + 1]
        new = dict(it)
        new["instr_encoding"] = ([bos_id] if bos_id is not None else []) + seq
        out.append(new)
    return out
