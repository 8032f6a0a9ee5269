"""Panorama (image) embedding branch with BACL image intervention.

Reference: CausalImageEmbeddings (map_nav_src/models/vilmodel_GOAT.py:164-316)
and the per-step variant forward_panorama_do_per_step (:649-737).

Ordering parity (they differ in the reference!):
- per-step path (:649-737): img projection -> back-door intervention ->
  (+ loc features) -> dropout -> 2-layer pre-norm self encoder -> adaptive fusion.
- trajectory path (:228-316, used by CFP extraction / pretraining):
  img projection -> (+ loc features) -> intervention -> dropout -> encoder.

Known deliberate divergence: the reference computes the adaptive-fusion
softmax over *all* padded slots (vilmodel_GOAT.py:310 has no mask), so its
output depends on batch composition (padded-slot garbage leaks into the
fused embedding).  We mask the softmax to valid views — deterministic and
batch-size invariant.  Divergence is zero whenever candidate counts in a
batch are equal, and empirically tiny otherwise.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import GoatConfig
from .layers import BertAttention, PanoEncoder, _dense, named_dropout

Dtype = Any

_NEG = -1e9


def masked_adaptive_fusion(x, weights_logit, mask):
    """softmax(tanh(w))-weighted pooling over valid slots (vilmodel_GOAT.py:306-314)."""
    act = jnp.tanh(weights_logit)
    act = jnp.where(mask[..., None], act, _NEG)
    w = jax.nn.softmax(act, axis=1)
    return jnp.sum(x * w, axis=1)


class CausalImageEmbeddings(nn.Module):
    """Image/object embedding + back-door intervention + pano self-encoder."""

    config: GoatConfig
    dtype: Dtype = jnp.float32

    def _backdoor(self, c, view, z_img_features, z_img_pzs, deterministic):
        """Back-door image adjustment (vilmodel_GOAT.py:244-268, 659-683)."""
        D = c.hidden_size
        z = nn.LayerNorm(epsilon=1e-12, name="do_img_layer_norm", dtype=self.dtype)(
            _dense(D, "do_img_before_linear", self.dtype)(z_img_features))
        if c.do_back_img_type == "type_1":
            sum_z = jnp.sum(z * z_img_pzs.astype(jnp.float32), axis=1, keepdims=True)
            view = (_dense(D, "img_after_linear", self.dtype)(view)
                    + _dense(D, "do_img_after_linear", self.dtype)(sum_z))
        else:  # type_2
            z = BertAttention(c, self.dtype, name="do_img_attn")(
                view, z, None, deterministic)
            if c.do_add_method == "door":
                w = jax.nn.sigmoid(
                    _dense(D, "img_after_linear", self.dtype)(view)
                    + _dense(D, "do_img_after_linear", self.dtype)(z))
                view = w * view + (1.0 - w) * z
            elif c.do_add_method == "add":
                view = view + z
            else:  # concat
                view = _dense(D, "do_concat_img_linear", self.dtype)(
                    jnp.concatenate([view, z], axis=-1))
        return nn.LayerNorm(epsilon=1e-12, name="do_img_concat_layernorm",
                            dtype=self.dtype)(view)

    @nn.compact
    def __call__(self, view_img_fts, loc_fts, nav_types, view_masks,
                 z_img_features=None, z_img_pzs=None,
                 obj_fts=None, obj_loc_fts=None, obj_masks=None, obj_names=None,
                 per_step: bool = True, pretrain: bool = False,
                 deterministic: bool = True):
        """Per-viewpoint panorama encoding.

        view_img_fts: [B, Lv, Dimg] raw CLIP features (candidate slots first).
        loc_fts:      [B, Lv, angle+3] (for objnav: [B, Lv+Lo, ...]).
        nav_types:    [B, Lv(+Lo)] int (0 non-cand view, 1 candidate, 2 object).
        view_masks:   [B, Lv] bool valid-view mask.
        Returns (embeds [B, L, D], masks [B, L], fused [B, D] or None).
        """
        c = self.config
        D = c.hidden_size

        view = nn.LayerNorm(epsilon=1e-12, name="img_layer_norm", dtype=self.dtype)(
            _dense(D, "img_linear", self.dtype)(view_img_fts))

        loc = None
        if not c.is_objnav:
            loc = nn.LayerNorm(epsilon=1e-12, name="loc_layer_norm", dtype=self.dtype)(
                _dense(D, "loc_linear", self.dtype)(loc_fts))
            if not per_step:
                view = view + loc

        if z_img_features is not None and c.do_back_img:
            view = self._backdoor(c, view, z_img_features, z_img_pzs, deterministic)

        if not c.is_objnav:
            if per_step:
                view = view + loc
            view = named_dropout(self, view, c.hidden_dropout_prob,
                                 deterministic)
            view = PanoEncoder(c, c.num_pano_layers, self.dtype,
                               name="img_self_encoder")(
                view, key_padding_mask=jnp.logical_not(view_masks),
                deterministic=deterministic)
            embeds, masks = view, view_masks
        else:
            # REVERIE/SOON: append object tokens (vilmodel_GOAT.py:697-726).
            obj = _dense(D, "obj_reverie_linear", self.dtype)(obj_fts)
            if c.use_obj_name and obj_names is not None:
                obj = obj + nn.Embed(c.obj_name_vocab_size, D,
                                     name="obj_name_linear", dtype=self.dtype)(obj_names)
            obj = nn.LayerNorm(epsilon=1e-12, name="obj_reverie_layer_norm",
                               dtype=self.dtype)(obj)
            embeds = jnp.concatenate([view, obj], axis=1)
            masks = jnp.concatenate([view_masks, obj_masks], axis=1)
            loc_all = nn.LayerNorm(epsilon=1e-12, name="loc_layer_norm",
                                   dtype=self.dtype)(
                _dense(D, "loc_linear", self.dtype)(loc_fts))
            nav_emb = nn.Embed(3, D, name="nav_type_embedding", dtype=self.dtype)(nav_types)
            embeds = embeds + loc_all + nav_emb
            if per_step or pretrain:
                # final LN on the per-step path (vilmodel_GOAT.py:720) AND
                # the PRETRAIN trajectory path (vilmodel_goat.py:343) — but
                # NOT the fine-tune trajectory path (vilmodel_GOAT.py:292-300
                # goes straight to dropout)
                embeds = nn.LayerNorm(epsilon=1e-12, name="layer_norm",
                                      dtype=self.dtype)(embeds)
            embeds = named_dropout(self, embeds, c.hidden_dropout_prob,
                                   deterministic)
            embeds = PanoEncoder(c, c.num_pano_layers, self.dtype,
                                 name="pano_encoder")(
                embeds, key_padding_mask=jnp.logical_not(masks),
                deterministic=deterministic)

        fused = None
        if c.adaptive_pano_fusion:
            w = _dense(1, "adaptive_pano_attn", self.dtype)(embeds)
            fused = masked_adaptive_fusion(embeds, w, masks)
        return embeds, masks, fused
