"""GOAT pre-training model: trajectory-level dual-scale encoder + proxy-task
heads (MLM / MRC / SAP / OG / CFP).

Reference: pretrain_src/model/vilmodel_goat.py (GlocalTextPathCMT :529) and
pretrain_src/model/pretrain_goat.py (GlocalTextPathCMTPreTraining :40).

Key structural notes reproduced:
- gmap tokens are [stop] + nodes, NO [MEM] token (vilmodel_goat.py:454,
  start index 1), unlike fine-tuning;
- MLM runs the cross-modal encoders with TEXT as the query over gmap / vp
  keys and sums the two streams (vilmodel_goat.py:624-648);
- heads live on the pre-training wrapper, `bert.*` holds the encoder — the
  checkpoint converter relies on this exact layout (vlnbert_init.py:52-69);
- MLM decoder weight is tied to the word embeddings
  (pretrain_goat.py:86-89).

TPU-native redesign:
- trajectories are fixed-shape [B, T, Lp, ...] arrays (Lp = K candidate
  slots + 36 views) instead of ragged flattened steps; the dict-keyed gmap
  aggregation (_aggregate_gmap_features, vilmodel_goat.py:430-468) becomes
  two gathers + one segment scatter driven by host-precomputed index maps
  (gmap_visited_step / cand_to_gmap);
- masked-token losses gather a static number of positions (mlm_pos) instead
  of boolean fancy-indexing.

Known deliberate divergence (same as panorama.py): the CFP attention
pooling softmax is masked to valid tokens; the reference pools over padding
too (pretrain_goat.py:501-515).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import GoatConfig
from ..models.backbone import (BertOnlyMLMHead, LanguageEncoder,
                               LanguageEncoderDo, RobertaEmbeddings)
from ..models.goat import fuse_logits
from ..models.layers import (BertAttention, BertPredictionHeadTransform,
                             ClsPrediction, CrossmodalEncoder)
from ..models.panorama import CausalImageEmbeddings, masked_adaptive_fusion
from ..ops.masks import extend_neg_masks

Dtype = Any
NEG_INF = -jnp.inf


class GoatPretrainModel(nn.Module):
    config: GoatConfig
    tasks: tuple = ("mlm", "sap", "cfp")
    image_prob_size: int = 1000
    obj_prob_size: int = 0
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.config
        self.embeddings = RobertaEmbeddings(c, self.dtype, name="embeddings")
        if c.do_back_txt:
            self.lang_encoder = LanguageEncoderDo(c, self.dtype, name="lang_encoder")
        else:
            self.lang_encoder = LanguageEncoder(c, self.dtype, name="lang_encoder")
        self.img_embeddings = CausalImageEmbeddings(c, self.dtype,
                                                    name="img_embeddings")
        # reuse the fine-tune encoder modules for exact param-name parity;
        # mode='extract_cfp_features' makes them carry the tim self-encoders
        # the cfp task needs (same trick as the reference's `pretrain_tasks`
        # gate, vilmodel_goat.py:374,422)
        enc_cfg = c.replace(mode="extract_cfp_features") \
            if "cfp" in self.tasks else c
        from ..models.goat import GlobalMapEncoder, LocalVPEncoder
        self.local_encoder = LocalVPEncoder(enc_cfg, self.dtype,
                                            name="local_encoder")
        self.global_encoder = GlobalMapEncoder(enc_cfg, self.dtype,
                                               name="global_encoder")

        # ---- heads (wrapper level) ----
        if "mlm" in self.tasks:
            self.mlm_head = BertOnlyMLMHead(c, self.dtype, name="mlm_head")
        if "mrc" in self.tasks:
            self.image_classifier = ClsPrediction(
                c, output_size=self.image_prob_size, dtype=self.dtype,
                name="image_classifier")
            if self.obj_prob_size > 0 and self.obj_prob_size != self.image_prob_size:
                self.obj_classifier = ClsPrediction(
                    c, output_size=self.obj_prob_size, dtype=self.dtype,
                    name="obj_classifier")
            else:
                self.obj_classifier = None
        if "sap" in self.tasks or "cfp" in self.tasks:
            self.global_sap_head = ClsPrediction(c, dtype=self.dtype,
                                                 name="global_sap_head")
            self.local_sap_head = ClsPrediction(c, dtype=self.dtype,
                                                name="local_sap_head")
            if c.glocal_fuse:
                self.sap_fuse_linear = ClsPrediction(
                    c, input_size=c.hidden_size * 2, dtype=self.dtype,
                    name="sap_fuse_linear")
        if "og" in self.tasks:
            self.og_head = ClsPrediction(c, dtype=self.dtype, name="og_head")
        if "cfp" in self.tasks:
            self.tim_txt_head = BertPredictionHeadTransform(
                c, self.dtype, name="tim_txt_head")
            self.tim_global_head = BertPredictionHeadTransform(
                c, self.dtype, name="tim_global_head")
            self.tim_local_head = BertPredictionHeadTransform(
                c, self.dtype, name="tim_local_head")
            self.tim_fused_head = BertPredictionHeadTransform(
                c, self.dtype, name="tim_fused_head")
            self.tim_txt_attn = self.param(
                "tim_txt_attn", lambda k, s: jax.random.uniform(k, s, jnp.float32,
                                                                -0.1, 0.1),
                (c.hidden_size, 1))
            self.tim_global_attn = self.param(
                "tim_global_attn", lambda k, s: jax.random.uniform(
                    k, s, jnp.float32, -0.1, 0.1), (c.hidden_size, 1))
            self.tim_local_attn = self.param(
                "tim_local_attn", lambda k, s: jax.random.uniform(
                    k, s, jnp.float32, -0.1, 0.1), (c.hidden_size, 1))
            self.tim_fused_attn = self.param(
                "tim_fused_attn", lambda k, s: jax.random.uniform(
                    k, s, jnp.float32, -0.1, 0.1), (c.hidden_size, 1))

    # ------------------------------------------------------------------
    def encode_text(self, batch, deterministic=True):
        txt = self.embeddings(batch["txt_ids"], deterministic=deterministic)
        c = self.config
        if c.do_back_txt:
            txt = self.lang_encoder(
                txt, batch["txt_masks"],
                batch.get("instr_z_direction_features"),
                batch.get("instr_z_direction_pzs"),
                batch.get("instr_z_landmark_features"),
                batch.get("instr_z_landmark_pzs"), None,
                deterministic=deterministic)
        else:
            txt = self.lang_encoder(txt, batch["txt_masks"],
                                    deterministic=deterministic)
        return txt

    def encode_traj(self, batch, deterministic=True):
        """[B, T, Lp, ...] -> pano embeds [B, T, Lp, D] + fused [B, T, D]."""
        c = self.config
        v = batch["traj_view_img_fts"]
        B, T, Lp = v.shape[:3]

        def flat(x):
            return x.reshape((B * T,) + x.shape[2:])

        obj_kw = {}
        if c.is_objnav and batch.get("traj_obj_img_fts") is not None:
            obj_kw = dict(obj_fts=flat(batch["traj_obj_img_fts"]),
                          obj_masks=flat(batch["traj_obj_masks"]),
                          obj_names=flat(batch["traj_obj_names"])
                          if batch.get("traj_obj_names") is not None else None)
        embeds, masks, fused = self.img_embeddings(
            flat(v), flat(batch["traj_loc_fts"]),
            flat(batch["traj_nav_types"]), flat(batch["traj_view_masks"]),
            batch.get("img_z_features"), batch.get("img_z_pzs"),
            per_step=False, pretrain=True, deterministic=deterministic,
            **obj_kw)
        L = embeds.shape[1]
        embeds = embeds.reshape(B, T, L, -1)
        masks = masks.reshape(B, T, L)
        if fused is None:
            m = masks[..., None].astype(embeds.dtype)
            fused = (jnp.sum(embeds.reshape(B, T, L, -1) * m, 2)
                     / jnp.maximum(jnp.sum(m, 2), 1.0))
        else:
            fused = fused.reshape(B, T, -1)
        # zero out padded steps so downstream scatters stay clean
        stepm = batch["step_masks"][..., None, None].astype(embeds.dtype)
        embeds = embeds * stepm
        fused = fused * batch["step_masks"][..., None].astype(fused.dtype)
        return embeds, masks, fused

    def aggregate_gmap(self, pano_embeds, pano_fused, batch):
        from ..models.traj import aggregate_gmap_features

        return aggregate_gmap_features(
            pano_embeds, pano_fused, batch["gmap_visited_step"],
            batch["cand_to_gmap"], batch["gmap_step_ids"].shape[1])

    # ------------------------------------------------------------------
    def encode(self, batch, return_gmap=True, cfp_self=False,
               deterministic=True):
        """bert.forward equivalent -> (gmap_embeds, vp_embeds, txt_embeds)."""
        c = self.config
        txt = self.encode_text(batch, deterministic)
        pano_embeds, pano_masks, pano_fused = self.encode_traj(batch,
                                                               deterministic)
        B, T, Lp, D = pano_embeds.shape

        gmap_embeds = None
        if return_gmap:
            gmap_img = self.aggregate_gmap(pano_embeds, pano_fused, batch)
            gmap_embeds = self.global_encoder.input_embed(
                gmap_img, batch["gmap_step_ids"], batch["gmap_pos_fts"])
            if cfp_self:
                bias = extend_neg_masks(batch["gmap_masks"])
                gmap_embeds = self.global_encoder.tim_self_encoder(
                    gmap_embeds, None, bias, deterministic)
            else:
                sprels = self.global_encoder.sprel_bias(batch["gmap_pair_dists"])
                gmap_embeds = self.global_encoder.encoder(
                    gmap_embeds, batch["gmap_masks"], txt, batch["txt_masks"],
                    graph_sprels=sprels, deterministic=deterministic)

        # local branch: [stop] + last-step pano tokens
        bidx = jnp.arange(B)
        last = batch["traj_len"] - 1
        last_embeds = pano_embeds[bidx, last]           # [B, Lp, D]
        last_masks = pano_masks[bidx, last]
        vp_img = jnp.concatenate([jnp.zeros((B, 1, D)), last_embeds], axis=1)
        vp_masks = jnp.concatenate([jnp.ones((B, 1), bool), last_masks], axis=1)
        vp_embeds = vp_img + self.local_encoder.pos_embed(batch["vp_pos_fts"])
        if cfp_self:
            bias = extend_neg_masks(vp_masks)
            vp_embeds = self.local_encoder.tim_self_encoder(
                vp_embeds, None, bias, deterministic)
        else:
            vp_embeds = self.local_encoder.encoder(
                vp_embeds, vp_masks, txt, batch["txt_masks"],
                deterministic=deterministic)
        return gmap_embeds, vp_embeds, vp_masks, txt

    # ------------------------------------------------------------------
    # task: MLM (pretrain_goat.py:188-218 + vilmodel_goat.forward_mlm)
    def forward_mlm(self, batch, deterministic=True):
        c = self.config
        txt = self.encode_text(batch, deterministic)
        pano_embeds, pano_masks, pano_fused = self.encode_traj(batch,
                                                               deterministic)
        B, T, Lp, D = pano_embeds.shape

        gmap_img = self.aggregate_gmap(pano_embeds, pano_fused, batch)
        gmap_in = self.global_encoder.input_embed(
            gmap_img, batch["gmap_step_ids"], batch["gmap_pos_fts"])
        # text as query over the two modal streams, summed
        gmap_txt = self.global_encoder.encoder(
            txt, batch["txt_masks"], gmap_in, batch["gmap_masks"],
            deterministic=deterministic)
        bidx = jnp.arange(B)
        last = batch["traj_len"] - 1
        vp_img = jnp.concatenate(
            [jnp.zeros((B, 1, D)), pano_embeds[bidx, last]], axis=1)
        vp_masks = jnp.concatenate(
            [jnp.ones((B, 1), bool), pano_masks[bidx, last]], axis=1)
        vp_in = vp_img + self.local_encoder.pos_embed(batch["vp_pos_fts"])
        vp_txt = self.local_encoder.encoder(
            txt, batch["txt_masks"], vp_in, vp_masks,
            deterministic=deterministic)
        txt_embeds = gmap_txt + vp_txt

        # gather the masked positions (static count) and project to vocab,
        # decoder tied to the word embeddings (pretrain_goat.py:86-89)
        pos = batch["mlm_pos"]                               # [B, M]
        hidden = txt_embeds[bidx[:, None], jnp.maximum(pos, 0)]
        shared = self.embeddings.word_embeddings.embedding
        logits = self.mlm_head(hidden, shared_embedding=shared)
        return logits                                        # [B, M, V]

    def mlm_loss(self, batch, deterministic=True):
        logits = self.forward_mlm(batch, deterministic)
        tgt = batch["mlm_tgt"]
        ok = batch["mlm_pos"] >= 0
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, jnp.maximum(tgt, 0)[..., None],
                                   axis=-1)[..., 0]
        n = jnp.maximum(jnp.sum(ok), 1)
        loss = jnp.sum(jnp.where(ok, nll, 0.0)) / n
        acc = jnp.sum((jnp.argmax(logits, -1) == tgt) & ok) / n
        return loss, {"mlm_acc": acc}

    # ------------------------------------------------------------------
    # task: MRC (pretrain_goat.py:226-284): KL to soft CLIP probs on masked
    # views of the end viewpoint
    def forward_mrc(self, batch, deterministic=True):
        _, vp_embeds, vp_masks, _ = self.encode(batch, return_gmap=False,
                                                deterministic=deterministic)
        view_embeds = vp_embeds[:, 1:]                       # drop [stop]
        logits = self.image_classifier(view_embeds)          # [B, Lp, P]
        return logits

    def mrc_loss(self, batch, deterministic=True):
        logits = self.forward_mrc(batch, deterministic)
        m = batch["mrc_masks"]                               # [B, Lp] bool
        probs = batch["mrc_targets"]                         # [B, Lp, P]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        kl = jnp.sum(probs * (jnp.log(jnp.maximum(probs, 1e-12)) - logp), -1)
        n = jnp.maximum(jnp.sum(m), 1)
        loss = jnp.sum(jnp.where(m, kl, 0.0)) / n
        return loss, {"mrc_kl": loss}

    # ------------------------------------------------------------------
    # task: SAP (pretrain_goat.py:286-354)
    def forward_sap(self, batch, deterministic=True):
        c = self.config
        gmap_embeds, vp_embeds, vp_masks, _ = self.encode(
            batch, deterministic=deterministic)
        if c.glocal_fuse:
            fuse_weights = jax.nn.sigmoid(self.sap_fuse_linear(
                jnp.concatenate([gmap_embeds[:, 0], vp_embeds[:, 0]], 1)))
        else:
            fuse_weights = 0.5
        global_logits = self.global_sap_head(gmap_embeds).squeeze(-1) * fuse_weights
        local_logits = self.local_sap_head(vp_embeds).squeeze(-1) * (1 - fuse_weights)

        B = vp_embeds.shape[0]
        last = batch["traj_len"] - 1
        last_nav_types = batch["traj_nav_types"][jnp.arange(B), last]
        vp_nav_masks = jnp.concatenate(
            [jnp.ones((B, 1), bool), last_nav_types == 1], axis=1)
        fused, gl, ll = fuse_logits(
            global_logits, local_logits, batch["gmap_masks"],
            batch["gmap_visited_masks"], vp_nav_masks,
            batch["local_to_gmap"], first_cand_slot=1, first_gmap_slot=1)
        return gl, ll, fused

    def sap_loss(self, batch, deterministic=True):
        gl, ll, fused = self.forward_sap(batch, deterministic)

        def ce(logits, labels):
            ok = labels >= 0   # ignore_index=-100 semantics
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, jnp.maximum(labels, 0)[:, None],
                                       1)[:, 0]
            return jnp.where(ok, nll, 0.0), ok

        g = batch["global_act_labels"]
        l = batch["local_act_labels"]
        lg, okg = ce(gl, g)
        lll, okl = ce(ll, l)
        lf, _ = ce(fused, g)
        # reference scale: mean over BATCH (ignored rows contribute 0 but
        # stay in the denominator — F.cross_entropy 'none' then .mean(),
        # train_r2r_goat task loop)
        B = g.shape[0]
        loss = jnp.sum(lg + lf + lll) / B
        n = jnp.maximum(jnp.sum(okg), 1)
        facc = jnp.sum((jnp.argmax(fused, -1) == g) & okg) / n
        gacc = jnp.sum((jnp.argmax(gl, -1) == g) & okg) / n
        lacc = jnp.sum((jnp.argmax(ll, -1) == l) & okl) / \
            jnp.maximum(jnp.sum(okl), 1)
        return loss, {"sap_facc": facc, "sap_gacc": gacc, "sap_lacc": lacc}

    # ------------------------------------------------------------------
    # task: OG (pretrain_goat.py:356-391)
    def og_loss(self, batch, deterministic=True):
        _, vp_embeds, vp_masks, _ = self.encode(batch, return_gmap=False,
                                                deterministic=deterministic)
        logits = self.og_head(vp_embeds).squeeze(-1)
        logits = jnp.where(batch["vp_obj_masks"], logits, NEG_INF)
        labels = batch["obj_labels"]
        has_obj = jnp.any(batch["vp_obj_masks"], axis=1)
        # all--inf rows make log_softmax (and its grad) NaN; sanitize first
        safe = jnp.where(has_obj[:, None], logits, 0.0)
        logp = jax.nn.log_softmax(safe.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, jnp.maximum(labels, 0)[:, None],
                                   1)[:, 0]
        ok = has_obj & (labels >= 0)
        n = jnp.maximum(jnp.sum(ok), 1)
        loss = jnp.sum(jnp.where(ok, nll, 0.0)) / n
        acc = jnp.sum((jnp.argmax(logits, -1) == labels) & ok) / n
        return loss, {"og_acc": acc}

    # ------------------------------------------------------------------
    # task: CFP (pretrain_goat.py:467-541)
    def forward_cfp(self, batch, extra_heads=True, deterministic=True):
        c = self.config
        gmap_embeds, vp_embeds, vp_masks, txt_embeds = self.encode(
            batch, cfp_self=True, deterministic=deterministic)
        if extra_heads:
            gmap_embeds = self.tim_global_head(gmap_embeds)
            vp_embeds = self.tim_local_head(vp_embeds)
            txt_embeds = self.tim_txt_head(txt_embeds)
        if c.glocal_fuse:
            fuse_weights = jax.nn.sigmoid(self.sap_fuse_linear(
                jnp.concatenate([gmap_embeds[:, 0], vp_embeds[:, 0]], 1)))
        else:
            fuse_weights = 0.5

        def pool(x, attn, mask):
            a = jnp.tanh(x) @ attn.astype(x.dtype)
            a = jnp.where(mask[..., None], a, -1e9)
            a = jax.nn.softmax(a, axis=1)
            return jnp.tanh(jnp.sum(x * a, axis=1))

        gmap_out = pool(gmap_embeds, self.tim_global_attn, batch["gmap_masks"])
        vp_out = pool(vp_embeds, self.tim_local_attn, vp_masks)
        txt_out = pool(txt_embeds, self.tim_txt_attn, batch["txt_masks"])
        fused_out = gmap_out * fuse_weights + vp_out * (1 - fuse_weights)
        return gmap_out, vp_out, fused_out, txt_out

    def cfp_loss(self, batch, deterministic=True):
        c = self.config
        gmap_out, vp_out, fused_out, txt_out = self.forward_cfp(
            batch, extra_heads=c.cfp_extra_head, deterministic=deterministic)
        B = txt_out.shape[0]
        tgt = jnp.arange(B)

        def nce(a, b):
            sim = (a @ b.T).astype(jnp.float32) / c.cfp_temperature
            lp1 = jax.nn.log_softmax(sim, axis=1)
            lp2 = jax.nn.log_softmax(sim.T, axis=1)
            l1 = -jnp.take_along_axis(lp1, tgt[:, None], 1)[:, 0]
            l2 = -jnp.take_along_axis(lp2, tgt[:, None], 1)[:, 0]
            return (l1 + l2) / 2.0, sim

        lg, sim_g = nce(gmap_out, txt_out)
        lv, _ = nce(vp_out, txt_out)
        lf, sim_f = nce(fused_out, txt_out)
        loss = jnp.mean(lg + lv + lf)
        acc = jnp.mean((jnp.argmax(sim_f, -1) == tgt).astype(jnp.float32))
        return loss, {"cfp_acc": acc}

    # ------------------------------------------------------------------
    def __call__(self, batch, task: str, deterministic=True):
        if task.startswith("mlm"):
            return self.mlm_loss(batch, deterministic)
        if task.startswith("mrc"):
            return self.mrc_loss(batch, deterministic)
        if task.startswith("sap"):
            return self.sap_loss(batch, deterministic)
        if task.startswith("og"):
            return self.og_loss(batch, deterministic)
        if task.startswith("cfp"):
            return self.cfp_loss(batch, deterministic)
        raise ValueError(f"invalid task {task}")
