"""Speaker wrapper: gt-path feature packing, teacher-forced training and
greedy/sampled decoding for back-translation.

Reference: map_nav_src/r2r/transpeaker.py (Speaker :13, train :214,
infer_batch :259-327, from_shortest_path :166).  The legacy whitespace
Tokenizer vocabulary convention is kept: pad=0, <BOS>, <EOS> ids from the
caller's vocab.

TPU-native: decode runs as a lax.scan over the max length with a growing
token buffer (full-prefix attention per step — the model is tiny, so the
O(L^2) recompute stays negligible and fully compiled).
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import geometry as G
from ..sim.graph_sim import ScanGraph
from .model import SpeakerConfig, TranspeakerModel


def build_path_batch(graphs: Dict[str, ScanGraph], features: np.ndarray,
                     offsets: Dict[str, int], items: Sequence[dict],
                     max_steps: int, angle_feat_size: int = 128,
                     image_feat_size: int = 768) -> Dict[str, np.ndarray]:
    """from_shortest_path equivalent: per-step action + panorama features
    along the gt path (speaker angle size 128, r2r/parser.py:117)."""
    B = len(items)
    F = image_feat_size + angle_feat_size
    action = np.zeros((B, max_steps, F), np.float32)
    pano = np.zeros((B, max_steps, 36, F), np.float32)
    step_masks = np.zeros((B, max_steps), bool)

    for b, it in enumerate(items):
        g = graphs[it["scan"]]
        path = it["path_local"]
        vi = G.view_index(it.get("heading", 0.0), 0.0)
        for t in range(min(len(path) - 1, max_steps)):
            vp, nxt = path[t], path[t + 1]
            feats = features[offsets[it["scan"]] + vp]
            cam_h = (vi % 12) * math.radians(30)
            cam_e = (vi // 12 - 1) * math.radians(30)
            # panorama: 36 views with angles relative to the camera
            rel_h = G.VIEW_HEADINGS - cam_h
            rel_e = G.VIEW_ELEVATIONS - cam_e
            ang = G.angle_feature_np(rel_h, rel_e, angle_feat_size)
            pano[b, t] = np.concatenate([feats, ang], -1)
            # action: the chosen candidate's view feature + its direction
            k = int(np.argmax((g.cand_local[vp] == nxt) & g.cand_mask[vp]))
            pt = int(g.cand_ptid[vp, k])
            a_ang = G.angle_feature_np(g.cand_heading[vp, k] - cam_h,
                                       g.cand_elev[vp, k] - cam_e,
                                       angle_feat_size)
            action[b, t] = np.concatenate([feats[pt], a_ang], -1)
            step_masks[b, t] = True
            vi = pt
    return dict(action=action, pano=pano, step_masks=step_masks)


class Speaker:
    def __init__(self, cfg: SpeakerConfig, rng=None):
        self.cfg = cfg
        self.model = TranspeakerModel(cfg)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        B, T = 2, 4
        self.params = self.model.init(
            rng, jnp.zeros((B, T, cfg.feature_size)),
            jnp.zeros((B, T, 36, cfg.feature_size)),
            jnp.ones((B, T), bool), jnp.zeros((B, 8), jnp.int32))
        self._jit = {}

    # ------------------------------------------------------------------
    def loss_fn(self, params, batch, rng, deterministic=False):
        """Teacher forcing: predict tokens[1:] from tokens[:-1]
        (transpeaker.py:214-257), CE ignoring pad."""
        kw = {} if deterministic else {"rngs": {"dropout": rng}}
        logits = self.model.apply(
            params, batch["action"], batch["pano"], batch["step_masks"],
            batch["tokens"][:, :-1], deterministic=deterministic, **kw)
        tgt = batch["tokens"][:, 1:]
        ok = tgt != self.cfg.pad_id
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        return jnp.sum(jnp.where(ok, nll, 0.0)) / jnp.maximum(jnp.sum(ok), 1)

    def make_train_step(self, lr: float = 1e-4):
        tx = optax.adam(lr)
        opt_state = tx.init(self.params)

        @jax.jit
        def step(params, opt_state, batch, rng):
            loss, grads = jax.value_and_grad(self.loss_fn)(params, batch, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step, opt_state

    # ------------------------------------------------------------------
    def infer(self, params, batch, rng=None, sample: bool = False,
              max_decode: Optional[int] = None,
              featdropmask: Optional[jnp.ndarray] = None):
        """Greedy/sampled decode (infer_batch, transpeaker.py:259-327).
        featdropmask: shared per-episode feature noise used by
        back-translation (agent.py:459-464)."""
        c = self.cfg
        L = max_decode or c.max_decode
        key = ("infer", sample, L)
        if key not in self._jit:
            def run(params, action, pano, step_masks, rng):
                _, enc = self.model.apply(
                    params, action, pano, step_masks,
                    method=TranspeakerModel.encode, deterministic=True)
                B = action.shape[0]
                toks = jnp.full((B, L + 1), c.pad_id, jnp.int32)
                toks = toks.at[:, 0].set(c.bos_id)
                ended = jnp.zeros((B,), bool)

                def body(carry, i):
                    toks, ended, rng = carry
                    logits = self.model.apply(
                        params, toks[:, :L], enc, step_masks,
                        method=TranspeakerModel.decode, deterministic=True)
                    step_logits = logits[jnp.arange(B), i]
                    if sample:
                        rng, k = jax.random.split(rng)
                        nxt = jax.random.categorical(k, step_logits, -1)
                    else:
                        nxt = jnp.argmax(step_logits, -1)
                    nxt = jnp.where(ended, c.pad_id, nxt).astype(jnp.int32)
                    toks = toks.at[:, i + 1].set(nxt)
                    ended = ended | (nxt == c.eos_id)
                    return (toks, ended, rng), None

                (toks, ended, _), _ = jax.lax.scan(
                    body, (toks, ended, rng if rng is not None else
                           jax.random.PRNGKey(0)), jnp.arange(L))
                return toks[:, 1:]

            self._jit[key] = jax.jit(run)
        action, pano = batch["action"], batch["pano"]
        if featdropmask is not None:
            action = action.at[..., :c.image_feat_size].multiply(featdropmask)
            pano = pano.at[..., :c.image_feat_size].multiply(featdropmask)
        return self._jit[key](params, action, pano, batch["step_masks"],
                              rng if rng is not None else jax.random.PRNGKey(0))
