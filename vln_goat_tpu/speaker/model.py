"""Transpeaker: encoder-decoder transformer speaker for back-translation.

Reference: map_nav_src/models/transpeaker_model.py.  Faithful quirks:
- attention inner dim is n_heads * aemb (4*64=256), NOT the hidden size
  (:11-17);
- the post-attention/FFN LayerNorms are created fresh every forward
  (`nn.LayerNorm(...).cuda()(...)`, :113,130) so they carry NO learned
  parameters — we use parameterless normalization to match;
- all projections are bias-free (:93-96);
- masks are boolean keep=False with -1e9 fill (:79-81);
- sinusoidal positional encoding (:32-47).

Hyper-parameters (r2r/parser.py:103-118): h_dim 512, wemb 256, aemb 64,
proj_hidden 1024, 3 layers, 4 heads, angle size 128.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


@dataclass
class SpeakerConfig:
    vocab_size: int = 1000
    feature_size: int = 768 + 128   # image + angle(128)
    image_feat_size: int = 768
    hidden_size: int = 512          # h_dim
    word_size: int = 256            # wemb
    head_dim: int = 64              # aemb
    num_heads: int = 4
    num_layers: int = 3
    ff_dim: int = 1024              # proj_hidden
    dropout: float = 0.2            # speaker_dropout
    feat_dropout: float = 0.3       # featdropout
    max_decode: int = 120
    pad_id: int = 0
    # legacy vocab convention: [<PAD>, <UNK>, <EOS>, ...words..., <BOS>]
    # (<BOS> is appended LAST, utils/data.py:308) — bos_id defaults to the
    # final vocab slot; eos is index 2
    bos_id: Optional[int] = None
    eos_id: int = 2

    def __post_init__(self):
        if self.bos_id is None:
            self.bos_id = self.vocab_size - 1


def _norm(x, eps=1e-5):
    """Parameterless LayerNorm (the reference's untrained per-call LN)."""
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def sinusoid_table(max_len: int, d: int) -> np.ndarray:
    pe = np.zeros((max_len, d), np.float32)
    pos = np.arange(max_len)[:, None].astype(np.float32)
    div = np.exp(np.arange(0, d, 2).astype(np.float32) * (-math.log(1e4) / d))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class SpeakerMHA(nn.Module):
    """MultiHeadAttention (transpeaker_model.py:88-115): bias-free
    projections to heads*aemb, residual + parameterless LN."""

    cfg: SpeakerConfig
    q_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in, mask=None, deterministic=True):
        c = self.cfg
        d = c.num_heads * c.head_dim
        q = nn.Dense(d, use_bias=False, name="W_Q", dtype=self.dtype)(q_in)
        k = nn.Dense(d, use_bias=False, name="W_K", dtype=self.dtype)(k_in)
        v = nn.Dense(d, use_bias=False, name="W_V", dtype=self.dtype)(v_in)
        B, Lq, Lk = q.shape[0], q.shape[1], k.shape[1]
        q = q.reshape(B, Lq, c.num_heads, c.head_dim)
        k = k.reshape(B, Lk, c.num_heads, c.head_dim)
        v = v.reshape(B, Lk, c.num_heads, c.head_dim)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(c.head_dim)
        if mask is not None:  # True = masked
            s = jnp.where(mask[:, None, :, :], -1e9, s)
        p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(self.dtype)
        p = nn.Dropout(c.dropout)(p, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, Lq, d)
        out = nn.Dense(self.q_dim, use_bias=False, name="fc",
                       dtype=self.dtype)(ctx)
        out = _norm(out + q_in)
        out = nn.Dropout(c.dropout)(out, deterministic=deterministic)
        return out, p


class SpeakerFFN(nn.Module):
    cfg: SpeakerConfig
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        c = self.cfg
        h = nn.Dense(c.ff_dim, use_bias=False, name="fc_0", dtype=self.dtype)(x)
        h = jax.nn.relu(h)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.dim, use_bias=False, name="fc_3", dtype=self.dtype)(h)
        return _norm(h + x)


class TranspeakerModel(nn.Module):
    """Full encoder-decoder (transpeaker_model.py:238-256)."""

    cfg: SpeakerConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.down_size = nn.Dense(c.hidden_size, name="encoder_down_size",
                                  dtype=self.dtype)
        self.image_self_attn = SpeakerMHA(c, c.hidden_size,
                                          name="encoder_image_self_attn")
        self.enc_self = [SpeakerMHA(c, c.hidden_size,
                                    name=f"enc_{i}_self_attn")
                         for i in range(c.num_layers)]
        self.enc_ffn = [SpeakerFFN(c, c.hidden_size, name=f"enc_{i}_ffn")
                        for i in range(c.num_layers)]
        self.embedding = nn.Embed(c.vocab_size, c.word_size, name="embedding",
                                  dtype=self.dtype)
        self.dec_self = [SpeakerMHA(c, c.word_size, name=f"dec_{i}_self_attn")
                         for i in range(c.num_layers)]
        self.dec_cross = [SpeakerMHA(c, c.word_size, name=f"dec_{i}_enc_attn")
                          for i in range(c.num_layers)]
        self.dec_ffn = [SpeakerFFN(c, c.word_size, name=f"dec_{i}_ffn")
                        for i in range(c.num_layers)]
        self.projection = nn.Dense(c.vocab_size, use_bias=False,
                                   name="projection", dtype=self.dtype)
        self.drop_feat = nn.Dropout(c.feat_dropout)
        self.drop = nn.Dropout(c.dropout)

    # ------------------------------------------------------------------
    def encode(self, action_inputs, feature_inputs, step_masks,
               already_dropfeat=False, deterministic=True):
        """action_inputs [B, T, F]; feature_inputs [B, T, 36, F];
        step_masks [B, T] valid steps."""
        c = self.cfg
        B, T, F = action_inputs.shape
        if not already_dropfeat:
            img = self.drop_feat(action_inputs[..., :c.image_feat_size],
                                 deterministic=deterministic)
            action_inputs = jnp.concatenate(
                [img, action_inputs[..., c.image_feat_size:]], -1)
            fimg = self.drop_feat(feature_inputs[..., :c.image_feat_size],
                                  deterministic=deterministic)
            feature_inputs = jnp.concatenate(
                [fimg, feature_inputs[..., c.image_feat_size:]], -1)

        ctx = self.down_size(action_inputs)                  # [B, T, H]
        ctx = ctx.reshape(B * T, 1, c.hidden_size)
        feats = feature_inputs.reshape(B * T, 36, F)
        enc_inputs, _ = self.image_self_attn(ctx, feats, feats,
                                             deterministic=deterministic)
        enc_inputs = enc_inputs.reshape(B, T, c.hidden_size)

        pe = jnp.asarray(sinusoid_table(T, c.hidden_size))
        h = enc_inputs + pe[None]
        h = self.drop(h, deterministic=deterministic)
        pad = ~step_masks                                     # True = pad
        mask = jnp.broadcast_to(pad[:, None, :], (B, T, T))
        for attn, ffn in zip(self.enc_self, self.enc_ffn):
            h, _ = attn(h, h, h, mask, deterministic=deterministic)
            h = ffn(h, deterministic=deterministic)
        return enc_inputs, h

    def decode(self, dec_inputs, enc_outputs, step_masks, deterministic=True):
        """dec_inputs [B, L] token ids (pad=0)."""
        c = self.cfg
        B, L = dec_inputs.shape
        x = self.embedding(dec_inputs)
        pe = jnp.asarray(sinusoid_table(L, c.word_size))
        x = x + pe[None]
        pad = dec_inputs == c.pad_id
        causal = jnp.triu(jnp.ones((L, L), bool), k=1)
        self_mask = pad[:, None, :] | causal[None]
        T = enc_outputs.shape[1]
        cross_mask = jnp.broadcast_to((~step_masks)[:, None, :], (B, L, T))
        for sa, ca, ffn in zip(self.dec_self, self.dec_cross, self.dec_ffn):
            x, _ = sa(x, x, x, self_mask, deterministic=deterministic)
            x, _ = ca(x, enc_outputs, enc_outputs, cross_mask,
                      deterministic=deterministic)
            x = ffn(x, deterministic=deterministic)
        return self.projection(x)                             # [B, L, V]

    def __call__(self, action_inputs, feature_inputs, step_masks, dec_inputs,
                 already_dropfeat=False, deterministic=True):
        _, enc = self.encode(action_inputs, feature_inputs, step_masks,
                             already_dropfeat, deterministic)
        return self.decode(dec_inputs, enc, step_masks, deterministic)
