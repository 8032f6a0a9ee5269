"""GOAT dual-scale cross-modal navigation model — TPU-native core.

Reference: GlocalTextPathNavCMT (map_nav_src/models/vilmodel_GOAT.py:556-927)
plus the VLNBert wrapper's env-feature dropout (map_nav_src/models/model.py:28-32).

Departures from the reference that are deliberate TPU-first redesigns:
- the per-example python loop that fuses local logits into the global map
  (vilmodel_GOAT.py:797-813) is replaced by `fuse_logits`, a fully batched
  one-hot scatter (MXU matmul) driven by a precomputed `local_to_gmap`
  index map supplied by the rollout engine;
- every mode takes fixed-shape padded arrays with boolean masks instead of
  ragged python lists, so one compiled XLA program serves every step.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import GoatConfig
from ..ops.masks import extend_neg_masks
from .backbone import (LanguageEncoder, LanguageEncoderDo, RobertaEmbeddings)
from .layers import (BertAttention, BertPooler, BertPredictionHeadTransform,
                     ClsPrediction, CrossmodalEncoder, _dense)
from .panorama import CausalImageEmbeddings

Dtype = Any
NEG_INF = -jnp.inf


class LocalVPEncoder(nn.Module):
    """vilmodel_GOAT.py:318-385."""

    config: GoatConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.config
        self.vp_pos_embeddings_0 = nn.Dense(c.hidden_size, name="vp_pos_embeddings_0",
                                            dtype=self.dtype)
        self.vp_pos_embeddings_1 = nn.LayerNorm(epsilon=1e-12,
                                                name="vp_pos_embeddings_1",
                                                dtype=self.dtype)
        self.encoder = CrossmodalEncoder(c, c.num_x_layers, self.dtype, name="encoder")
        if c.mode == "extract_cfp_features":
            self.tim_self_encoder = BertAttention(c, self.dtype, name="tim_self_encoder")

    def pos_embed(self, vp_pos_fts):
        return self.vp_pos_embeddings_1(self.vp_pos_embeddings_0(vp_pos_fts))

    def __call__(self, txt_embeds, txt_masks, vp_img_embeds, vp_pos_fts, vp_masks,
                 deterministic=True):
        vp_embeds = vp_img_embeds + self.pos_embed(vp_pos_fts)
        return self.encoder(vp_embeds, vp_masks, txt_embeds, txt_masks,
                            deterministic=deterministic)

    def forward_cfp(self, vp_img_embeds, vp_pos_fts, vp_masks, deterministic=True):
        vp_embeds = vp_img_embeds + self.pos_embed(vp_pos_fts)
        bias = extend_neg_masks(vp_masks)
        return self.tim_self_encoder(vp_embeds, None, bias, deterministic)


class GlobalMapEncoder(nn.Module):
    """vilmodel_GOAT.py:387-510."""

    config: GoatConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.config
        self.gmap_pos_embeddings_0 = nn.Dense(c.hidden_size,
                                              name="gmap_pos_embeddings_0",
                                              dtype=self.dtype)
        self.gmap_pos_embeddings_1 = nn.LayerNorm(epsilon=1e-12,
                                                  name="gmap_pos_embeddings_1",
                                                  dtype=self.dtype)
        self.gmap_step_embeddings = nn.Embed(c.max_action_steps, c.hidden_size,
                                             name="gmap_step_embeddings",
                                             dtype=self.dtype)
        self.encoder = CrossmodalEncoder(c, c.num_x_layers, self.dtype, name="encoder")
        if c.graph_sprels:
            self.sprel_linear = nn.Dense(1, name="sprel_linear", dtype=self.dtype)
        if c.mode == "extract_cfp_features":
            self.tim_self_encoder = BertAttention(c, self.dtype, name="tim_self_encoder")

    def input_embed(self, gmap_img_embeds, gmap_step_ids, gmap_pos_fts):
        return (gmap_img_embeds
                + self.gmap_step_embeddings(gmap_step_ids)
                + self.gmap_pos_embeddings_1(self.gmap_pos_embeddings_0(gmap_pos_fts)))

    def sprel_bias(self, gmap_pair_dists):
        """graph_sprels additive attention bias [B,1,G,G] (vilmodel_GOAT.py:752-754)."""
        if not self.config.graph_sprels:
            return None
        return self.sprel_linear(gmap_pair_dists[..., None]).squeeze(-1)[:, None]


def fuse_logits(global_logits, local_logits, gmap_masks, gmap_visited_masks,
                vp_nav_masks, local_to_gmap, first_cand_slot: int = 2,
                first_gmap_slot: int = 2):
    """Batched replacement for the fused-logits python scatter
    (vilmodel_GOAT.py:794-813; pretrain twin pretrain_goat.py:329-345 uses
    first_cand_slot=first_gmap_slot=1 — no [MEM] token there).

    Args:
      global_logits: [B, G] fuse-weighted global branch scores (pre-mask).
      local_logits:  [B, L] fuse-weighted local branch scores (pre-mask).
      gmap_masks:    [B, G] valid gmap token (slot0=stop, slot1=MEM masked
                     upstream).
      gmap_visited_masks: [B, G] True at visited-node tokens.
      vp_nav_masks:  [B, L] True at stop slot (0) and candidate slots.
      local_to_gmap: [B, L] int32 gmap slot of each local candidate, or -1
                     for the stop/MEM/non-candidate slots.  Visited
                     candidates must also carry their gmap slot (used to
                     derive the backtrack sum).
    Returns:
      (fused [B,G], masked_global [B,G], masked_local [B,L])
    """
    B, G = global_logits.shape
    L = local_logits.shape[1]
    slot = jnp.arange(G)[None, :]
    lslot = jnp.arange(L)[None, :]

    masked_global = jnp.where(gmap_visited_masks, NEG_INF, global_logits)
    masked_global = jnp.where(gmap_masks, masked_global, NEG_INF)
    masked_local = jnp.where(vp_nav_masks, local_logits, NEG_INF)

    # candidate slots are j >= first_cand_slot with a valid mapping
    is_cand = (lslot >= first_cand_slot) & (local_to_gmap >= 0) & vp_nav_masks
    lv = jnp.where(is_cand, local_logits, 0.0)
    tgt = jnp.clip(local_to_gmap, 0, G - 1)
    onehot = jax.nn.one_hot(tgt, G, dtype=lv.dtype) * is_cand[..., None]
    # is the candidate's gmap node visited?
    cand_visited = jnp.take_along_axis(gmap_visited_masks, tgt, axis=1) & is_cand
    bw = jnp.sum(jnp.where(cand_visited, lv, 0.0), axis=1)          # [B]
    # HIGHEST: TPU default matmul precision would truncate the f32 logit
    # payloads to bf16 inside this one-hot scatter, breaking exactness vs
    # the reference python scatter (can flip argmax near ties)
    direct = jnp.einsum("bl,blg->bg", jnp.where(cand_visited, 0.0, lv), onehot,
                        precision=jax.lax.Precision.HIGHEST)
    has_direct = jnp.einsum("bl,blg->bg",
                            (is_cand & ~cand_visited).astype(lv.dtype), onehot,
                            precision=jax.lax.Precision.HIGHEST) > 0

    unvis = (slot >= first_gmap_slot) & ~gmap_visited_masks & gmap_masks
    fused = masked_global + jnp.where(
        unvis, jnp.where(has_direct, direct, bw[:, None]), 0.0)
    # stop logit: fused[:,0] += local[:,0]
    fused = fused.at[:, 0].add(local_logits[:, 0])
    return fused, masked_global, masked_local


class GoatModel(nn.Module):
    """GlocalTextPathNavCMT equivalent.  Call via `method=` dispatch:

      model.apply(vars, ..., method=GoatModel.forward_text)
      model.apply(vars, ..., method=GoatModel.forward_panorama)
      model.apply(vars, ..., method=GoatModel.forward_navigation)
      model.apply(vars, ..., method=GoatModel.extract_cfp_pooled)
    """

    config: GoatConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.config
        self.embeddings = RobertaEmbeddings(c, self.dtype, name="embeddings")
        if c.do_back_txt or c.do_front_txt:
            self.lang_encoder = LanguageEncoderDo(c, self.dtype, name="lang_encoder")
        else:
            self.lang_encoder = LanguageEncoder(c, self.dtype, name="lang_encoder")
        self.img_embeddings = CausalImageEmbeddings(c, self.dtype, name="img_embeddings")
        self.local_encoder = LocalVPEncoder(c, self.dtype, name="local_encoder")
        self.global_encoder = GlobalMapEncoder(c, self.dtype, name="global_encoder")

        self.global_sap_head = ClsPrediction(c, dtype=self.dtype, name="global_sap_head")
        self.local_sap_head = ClsPrediction(c, dtype=self.dtype, name="local_sap_head")
        if c.glocal_fuse:
            self.sap_fuse_linear = ClsPrediction(c, input_size=c.hidden_size * 2,
                                                 dtype=self.dtype, name="sap_fuse_linear")
        if c.obj_feat_size > 0:
            self.og_head = ClsPrediction(c, dtype=self.dtype, name="og_head")

        self.gmap_pooler = BertPooler(c, self.dtype, name="gmap_pooler")
        self.vp_pooler = BertPooler(c, self.dtype, name="vp_pooler")
        self.txt_pooler = BertPooler(c, self.dtype, name="txt_pooler")
        self.local_his_map = nn.Dense(c.hidden_size, name="local_his_map",
                                      dtype=self.dtype)
        self.local_his_ln = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                         name="local_his_ln", dtype=self.dtype)
        # env-feature dropout (model.py:19, applied :28-32)
        self.drop_env = nn.Dropout(c.feat_dropout)

        if c.mode == "extract_cfp_features":
            self.tim_global_head = BertPredictionHeadTransform(
                c, self.dtype, name="tim_global_head")
            self.tim_local_head = BertPredictionHeadTransform(
                c, self.dtype, name="tim_local_head")
            self.tim_txt_head = BertPredictionHeadTransform(
                c, self.dtype, name="tim_txt_head")
            init = nn.initializers.normal(0.02)
            self.tim_global_attn = self.param("tim_global_attn", init,
                                              (c.hidden_size, 1))
            self.tim_local_attn = self.param("tim_local_attn", init,
                                             (c.hidden_size, 1))
            self.tim_txt_attn = self.param("tim_txt_attn", init, (c.hidden_size, 1))

        if c.do_front_img:
            self.front_local_encoder = FrontDoorEncoder(c, self.dtype,
                                                        name="front_local_encoder")
        if c.do_front_his:
            self.front_global_encoder = FrontDoorEncoder(c, self.dtype,
                                                         name="front_global_encoder")
        if c.do_front_txt:
            self.front_txt_encoder = FrontDoorEncoder(c, self.dtype,
                                                      name="front_txt_encoder")

    # ------------------------------------------------------------------
    # mode: 'language' (vilmodel_GOAT.py:628-639, 847-854)
    def forward_text(self, txt_ids, txt_masks,
                     z_direc_embeds=None, z_direc_pzs=None,
                     z_landm_embeds=None, z_landm_pzs=None,
                     front_txt_embeds=None, deterministic=True):
        txt_embeds = self.embeddings(txt_ids, deterministic=deterministic)
        c = self.config
        if c.do_back_txt or c.do_front_txt:
            return self.lang_encoder(
                txt_embeds, txt_masks, z_direc_embeds, z_direc_pzs,
                z_landm_embeds, z_landm_pzs, front_txt_embeds,
                deterministic=deterministic)
        return self.lang_encoder(txt_embeds, txt_masks, deterministic=deterministic)

    # ------------------------------------------------------------------
    # mode: 'panorama' (vilmodel_GOAT.py:649-737 + model.py:28-32 feat dropout)
    def forward_panorama(self, view_img_fts, loc_fts, nav_types, view_masks,
                         z_img_features=None, z_img_pzs=None,
                         obj_fts=None, obj_loc_fts=None, obj_masks=None,
                         obj_names=None, already_dropout=False,
                         deterministic=True):
        c = self.config
        if not already_dropout:
            view_img_fts = self.drop_env(view_img_fts, deterministic=deterministic)
            if obj_fts is not None:
                obj_fts = self.drop_env(obj_fts, deterministic=deterministic)
        return self.img_embeddings(
            view_img_fts, loc_fts, nav_types, view_masks,
            z_img_features, z_img_pzs, obj_fts, obj_loc_fts, obj_masks,
            obj_names, per_step=True, deterministic=deterministic)

    # ------------------------------------------------------------------
    def forward_text_kv(self, txt_embeds):
        """Per-layer cross-attention K/V projections of the instruction.

        The text is constant across rollout steps, so these matmuls (2 per
        cross layer per branch, recomputed at every step by the reference,
        vilmodel_GOAT.py:747-776) are hoisted out of the scan: computed
        once per episode here, then fed to forward_navigation(txt_kv=...).
        Numerically identical — same projections, applied once."""
        return {
            "global": self.global_encoder.encoder(
                None, None, txt_embeds, None, kv_only=True),
            "local": self.local_encoder.encoder(
                None, None, txt_embeds, None, kv_only=True),
        }

    # ------------------------------------------------------------------
    # mode: 'navigation' (vilmodel_GOAT.py:739-839)
    def forward_navigation(
        self, txt_embeds, txt_masks,
        gmap_img_embeds, gmap_step_ids, gmap_pos_fts, gmap_masks,
        gmap_pair_dists, gmap_visited_masks,
        vp_img_embeds, vp_pos_fts, vp_masks, vp_nav_masks,
        local_to_gmap, vp_obj_masks=None,
        front_vp_feats=None, front_gmap_feats=None, txt_kv=None,
        deterministic=True,
    ) -> Dict[str, jnp.ndarray]:
        c = self.config

        # global branch input
        gmap_embeds = self.global_encoder.input_embed(
            gmap_img_embeds, gmap_step_ids, gmap_pos_fts)
        graph_sprels = self.global_encoder.sprel_bias(gmap_pair_dists)
        if front_gmap_feats is not None:
            gmap_embeds = self.front_global_encoder(
                gmap_embeds, front_gmap_feats, gmap_masks, deterministic)
        # local branch input
        vp_embeds = vp_img_embeds + self.local_encoder.pos_embed(vp_pos_fts)
        if front_vp_feats is not None:
            vp_embeds = self.front_local_encoder(
                vp_embeds, front_vp_feats, vp_masks, deterministic)

        # (a grouped dual-branch variant that ran both ~50-token encoders
        # as one stacked-weight computation was pruned in r5: it measured
        # SLOWER on chip, 84.8 vs 96.5 eps/s — padding both branches to a
        # common length outweighed the halved dispatch count)
        gmap_embeds = self.global_encoder.encoder(
            gmap_embeds, gmap_masks, txt_embeds, txt_masks,
            graph_sprels=graph_sprels, deterministic=deterministic,
            kv_caches=None if txt_kv is None else txt_kv["global"])
        vp_embeds = self.local_encoder.encoder(
            vp_embeds, vp_masks, txt_embeds, txt_masks,
            deterministic=deterministic,
            kv_caches=None if txt_kv is None else txt_kv["local"])

        # fusion weights (vilmodel_GOAT.py:777-786)
        if c.glocal_fuse:
            fuse_weights = jax.nn.sigmoid(self.sap_fuse_linear(
                jnp.concatenate([gmap_embeds[:, 0], vp_embeds[:, 0]], axis=1)))
        else:
            fuse_weights = 0.5
        global_logits = self.global_sap_head(gmap_embeds).squeeze(-1) * fuse_weights
        local_logits = self.local_sap_head(vp_embeds).squeeze(-1) * (1.0 - fuse_weights)

        fused_logits, global_logits, local_logits = fuse_logits(
            global_logits, local_logits, gmap_masks, gmap_visited_masks,
            vp_nav_masks, local_to_gmap)

        # object grounding (REVERIE/SOON)
        obj_logits = None
        if vp_obj_masks is not None and c.obj_feat_size > 0:
            obj_logits = self.og_head(vp_embeds).squeeze(-1)
            obj_logits = jnp.where(vp_obj_masks, obj_logits, NEG_INF)

        # history [MEM] embedding (vilmodel_GOAT.py:822-826)
        cls_embeds = self.local_his_ln(self.local_his_map(jnp.concatenate([
            self.gmap_pooler(gmap_embeds), self.vp_pooler(vp_embeds),
            self.txt_pooler(txt_embeds)], axis=-1)))

        return {
            "gmap_embeds": gmap_embeds,
            "vp_embeds": vp_embeds,
            "global_logits": global_logits,
            "local_logits": local_logits,
            "fused_logits": fused_logits,
            "obj_logits": obj_logits,
            "cls_embeds": cls_embeds,
        }

    # ------------------------------------------------------------------
    # mode: 'extract_cfp_features' (vilmodel_GOAT.py:885-926): trajectory
    # encode with tim self-encoders, then attention-pooled txt/vp/gmap
    # vectors.  Batch layout matches pretrain/data.TrajBatchBuilder.
    def extract_cfp(self, batch, deterministic=True):
        from .traj import aggregate_gmap_features

        c = self.config
        txt_embeds = self.forward_text(batch["txt_ids"], batch["txt_masks"],
                                       deterministic=deterministic)
        v = batch["traj_view_img_fts"]
        B, T, Lp = v.shape[:3]

        def flat(x):
            return x.reshape((B * T,) + x.shape[2:])

        embeds, masks, fused = self.img_embeddings(
            flat(v), flat(batch["traj_loc_fts"]),
            flat(batch["traj_nav_types"]), flat(batch["traj_view_masks"]),
            per_step=False, deterministic=deterministic)
        D = embeds.shape[-1]
        embeds = embeds.reshape(B, T, Lp, D)
        masks = masks.reshape(B, T, Lp)
        if fused is None:
            m = masks[..., None].astype(embeds.dtype)
            fused = jnp.sum(embeds * m, 2) / jnp.maximum(jnp.sum(m, 2), 1.0)
        else:
            fused = fused.reshape(B, T, D)
        stepm = batch["step_masks"]
        embeds = embeds * stepm[..., None, None]
        fused = fused * stepm[..., None]

        gmap_img = aggregate_gmap_features(
            embeds, fused, batch["gmap_visited_step"], batch["cand_to_gmap"],
            batch["gmap_step_ids"].shape[1])
        gmap_embeds = self.global_encoder.input_embed(
            gmap_img, batch["gmap_step_ids"], batch["gmap_pos_fts"])
        bias = extend_neg_masks(batch["gmap_masks"])
        gmap_embeds = self.global_encoder.tim_self_encoder(
            gmap_embeds, None, bias, deterministic)

        bidx = jnp.arange(B)
        last = batch["traj_len"] - 1
        vp_img = jnp.concatenate(
            [jnp.zeros((B, 1, D)), embeds[bidx, last]], axis=1)
        vp_masks = jnp.concatenate(
            [jnp.ones((B, 1), bool), masks[bidx, last]], axis=1)
        vp_embeds = vp_img + self.local_encoder.pos_embed(batch["vp_pos_fts"])
        vbias = extend_neg_masks(vp_masks)
        vp_embeds = self.local_encoder.tim_self_encoder(
            vp_embeds, None, vbias, deterministic)

        return self.cfp_pool(gmap_embeds, vp_embeds, txt_embeds)

    def cfp_pool(self, gmap_embeds, vp_embeds, txt_embeds):
        def pool(x, head, attn):
            h = head(x)
            a = jax.nn.softmax(jnp.tanh(h) @ attn.astype(h.dtype), axis=1)
            return jnp.tanh(jnp.sum(h * a, axis=1))

        return {
            "gmap_outputs": pool(gmap_embeds, self.tim_global_head, self.tim_global_attn),
            "vp_outputs": pool(vp_embeds, self.tim_local_head, self.tim_local_attn),
            "txt_outputs": pool(txt_embeds, self.tim_txt_head, self.tim_txt_attn),
        }


class Critic(nn.Module):
    """Value head 768->512->1 (models/model.py:40-51).  Constructed and
    optimized by the reference but never trained — no RL loss is ever
    computed (rollout accumulates IL loss only, r2r/agent.py:614-621);
    provided for API/checkpoint parity.  torch names state2value.0/.3."""

    config: GoatConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, state, deterministic=True):
        h = _dense(512, "state2value_0", self.dtype)(state)
        h = jax.nn.relu(h)
        h = nn.Dropout(self.config.hidden_dropout_prob)(
            h, deterministic=deterministic)
        return _dense(1, "state2value_3", self.dtype)(h).squeeze(-1)


class FrontDoorEncoder(nn.Module):
    """FACL front-door encoder (vilmodel_GOAT.py:526-554): self-attn +
    cross-attn to the k-means dictionary, gated 'door' merge."""

    config: GoatConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, local_feats, global_feats, local_feats_masks=None,
                 deterministic=True):
        c = self.config
        bias = None
        if local_feats_masks is not None:
            bias = extend_neg_masks(local_feats_masks)
        ll = BertAttention(c, self.dtype, name="ll_self_attn")(
            local_feats, None, bias, deterministic)
        lg = BertAttention(c, self.dtype, name="lg_cross_attn")(
            local_feats, global_feats, None, deterministic)
        out = nn.LayerNorm(epsilon=1e-12, name="ln", dtype=self.dtype)(ll + lg)
        w = jax.nn.sigmoid(_dense(1, "aug_linear", self.dtype)(out)
                           + _dense(1, "ori_linear", self.dtype)(local_feats))
        return w * out + (1.0 - w) * local_feats
