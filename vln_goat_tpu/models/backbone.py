"""Text side of GOAT: RoBERTa embeddings + language encoder with BACL/FACL
text interventions.

Reference semantics reproduced:
- RobertaEmbeddings (Bert_backbone.py:55-114): word + position + token-type
  embeddings, LayerNorm(layer_norm_eps), dropout.  In the fine-tune model the
  position ids are a plain arange (Bert_backbone.py:94-96) — the
  padding-offset helper exists but is NOT called on this path.
- LanguageEncoder (vilmodel_GOAT.py:33-53): N RobertaLayers under an
  additive -10000 mask; optional stop-gradient when the language tower is
  frozen (update_lang_bert=False -> detach, :51-52).
- LanguageEncoderDo (vilmodel_GOAT.py:55-162): adds back-door (type_1
  weighted-sum / type_2 cross-attention) and front-door (cross-attention to
  CFP cluster bank) interventions with door/add/concat merges.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import GoatConfig
from ..ops.masks import extend_neg_masks
from .layers import (BertAttention, BertLayer, BertPredictionHeadTransform,
                     _dense)

Dtype = Any


class RobertaEmbeddings(nn.Module):
    """setup-style so the MLM head can tie to `word_embeddings.embedding`
    (pretrain_goat.py:86-89)."""

    config: GoatConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.config
        self.word_embeddings = nn.Embed(c.vocab_size, c.hidden_size,
                                        name="word_embeddings", dtype=self.dtype)
        self.position_embeddings = nn.Embed(
            c.max_position_embeddings, c.hidden_size,
            name="position_embeddings", dtype=self.dtype)
        self.token_type_embeddings = nn.Embed(
            c.type_vocab_size, c.hidden_size, name="token_type_embeddings",
            dtype=self.dtype)
        self.LayerNorm = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                      name="LayerNorm", dtype=self.dtype)
        self.dropout = nn.Dropout(c.hidden_dropout_prob)

    def __call__(self, input_ids, token_type_ids=None, position_ids=None,
                 deterministic=True):
        B, L = input_ids.shape
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        h = (self.word_embeddings(input_ids)
             + self.token_type_embeddings(token_type_ids)
             + self.position_embeddings(position_ids))
        h = self.LayerNorm(h)
        return self.dropout(h, deterministic=deterministic)


class LanguageEncoder(nn.Module):
    """Plain N-layer RoBERTa stack (vilmodel_GOAT.py:33-53)."""

    config: GoatConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, txt_embeds, txt_masks, deterministic=True):
        c = self.config
        bias = extend_neg_masks(txt_masks)
        h = txt_embeds
        for i in range(c.num_l_layers):
            h = BertLayer(c, self.dtype, name=f"layer_{i}")(h, bias, deterministic)
        if not c.update_lang_bert:
            h = jax.lax.stop_gradient(h)
        return h


class LanguageEncoderDo(nn.Module):
    """RoBERTa stack + BACL/FACL text interventions (vilmodel_GOAT.py:55-162)."""

    config: GoatConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, txt_embeds, txt_masks,
                 z_direc_embeds=None, z_direc_pzs=None,
                 z_landm_embeds=None, z_landm_pzs=None,
                 front_txt_embeds=None, deterministic=True):
        c = self.config
        bias = extend_neg_masks(txt_masks)
        h = txt_embeds
        for i in range(c.num_l_layers):
            h = BertLayer(c, self.dtype, name=f"layer_{i}")(h, bias, deterministic)
        if not c.update_lang_bert:
            h = jax.lax.stop_gradient(h)

        if not (c.do_back_txt or c.do_front_txt):
            return h

        D = c.hidden_size
        if c.do_back_txt_type == "type_1":
            if c.do_back_txt:
                sum_z_direct = jnp.sum(z_direc_embeds * z_direc_pzs.astype(jnp.float32),
                                       axis=1, keepdims=True)
                sum_z_landm = jnp.sum(z_landm_embeds * z_landm_pzs.astype(jnp.float32),
                                      axis=1, keepdims=True)
                h = (_dense(D, "z_txt_linear", self.dtype)(h)
                     + _dense(D, "z_direct_linear", self.dtype)(sum_z_direct)
                     + _dense(D, "z_landm_linear", self.dtype)(sum_z_landm))
            if c.do_front_txt and front_txt_embeds is not None:
                zf = BertAttention(c, self.dtype, name="z_front_cross_attn")(
                    h, front_txt_embeds, None, deterministic)
                zf = nn.LayerNorm(epsilon=c.layer_norm_eps, name="z_front_ln",
                                  dtype=self.dtype)(
                    _dense(D, "z_front_linear", self.dtype)(zf))
                h = h + zf
            h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="z_concat_layernorm",
                             dtype=self.dtype)(h)
            return h

        # type_2: cross-attention interventions
        zd = zl = zf = None
        if c.do_back_txt:
            zd = BertAttention(c, self.dtype, name="z_direc_cross_attn")(
                h, z_direc_embeds, None, deterministic)
            zd = nn.LayerNorm(epsilon=c.layer_norm_eps, name="z_direct_ln",
                              dtype=self.dtype)(_dense(D, "z_direct_linear", self.dtype)(zd))
            if z_landm_embeds is not None:
                zl = BertAttention(c, self.dtype, name="z_landm_cross_attn")(
                    h, z_landm_embeds, None, deterministic)
                zl = nn.LayerNorm(epsilon=c.layer_norm_eps, name="z_landm_ln",
                                  dtype=self.dtype)(_dense(D, "z_landm_linear", self.dtype)(zl))
        if c.do_front_txt and front_txt_embeds is not None:
            zf = BertAttention(c, self.dtype, name="z_front_cross_attn")(
                h, front_txt_embeds, None, deterministic)
            zf = nn.LayerNorm(epsilon=c.layer_norm_eps, name="z_front_ln",
                              dtype=self.dtype)(_dense(D, "z_front_linear", self.dtype)(zf))

        if c.do_add_method == "door":
            if c.do_back_txt:
                aug = zd
                if zl is not None:
                    aug = aug + zl
                if zf is not None:
                    aug = aug + zf
            else:
                aug = zf
            w = jax.nn.sigmoid(
                _dense(1, "instr_aug_linear", self.dtype)(aug)
                + _dense(1, "instr_ori_linear", self.dtype)(h))
            h = w * aug + (1.0 - w) * h
        elif c.do_add_method == "add":
            if c.do_back_txt:
                h = h + zd + zl
            if zf is not None:
                h = h + zf
        elif c.do_add_method == "concat":
            h = _dense(c.hidden_size, "concat_linear", self.dtype)(
                jnp.concatenate([h, zd, zl], axis=-1))

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="z_concat_layernorm",
                         dtype=self.dtype)(h)
        return h


class BertOnlyMLMHead(nn.Module):
    """MLM head wrapper keeping the reference's `predictions` scope
    (Bert_backbone.py:902-909)."""

    config: GoatConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, shared_embedding: Optional[jnp.ndarray] = None):
        return BertLMPredictionHead(self.config, self.dtype,
                                    name="predictions")(hidden, shared_embedding)


class BertLMPredictionHead(nn.Module):
    """transform -> tied/untied decoder + bias (Bert_backbone.py:884-900).

    The decoder weight can be tied to word embeddings by the caller passing
    `shared_embedding`; reference ties it in pretraining
    (pretrain_src/model/pretrain_goat.py:86-89).
    """

    config: GoatConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, shared_embedding: Optional[jnp.ndarray] = None):
        c = self.config
        h = BertPredictionHeadTransform(c, self.dtype, name="transform")(hidden)
        if shared_embedding is not None:
            logits = h @ shared_embedding.T.astype(self.dtype)
        else:
            logits = nn.Dense(c.vocab_size, use_bias=False, name="decoder",
                              dtype=self.dtype)(h)
        bias = self.param("bias", nn.initializers.zeros, (c.vocab_size,))
        return logits + bias.astype(self.dtype)
