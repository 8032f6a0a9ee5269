"""Transformer building blocks (flax.linen), numerically matching the
reference BERT/RoBERTa blocks (map_nav_src/models/Bert_backbone.py) and the
DETR pre-norm encoder (map_nav_src/models/transformer.py:133-190).

Parity rules honored throughout:
- additive -10000 masks (ops/masks.py), softmax in float32;
- erf-gelu;
- LayerNorm eps: config.layer_norm_eps (1e-5) inside BERT blocks, 1e-12 where
  the reference hardcodes BertLayerNorm(..., eps=1e-12);
- module *names* mirror the torch state-dict keys so the checkpoint
  converter (train/checkpoint.py) is mechanical: torch "a.0.b.weight" ->
  flax path ("a_0", "b", "kernel").

TPU notes: all attention shapes here are tiny (<=256 tokens, head_dim 64),
so a single fused XLA dot-general chain is already MXU-bound; batching—not
kernel exotica—is where the throughput comes from. Compute dtype is
switchable to bfloat16 (params stay fp32).
"""
from __future__ import annotations

import math
import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _ckpt_name
from flax import linen as nn

from ..config import GoatConfig
from ..ops.activations import ACT2FN
from ..ops.masks import extend_neg_masks

Dtype = Any


def _dense(features, name, dtype):
    return nn.Dense(features, name=name, dtype=dtype)


def named_dropout(mod: nn.Module, x, rate: float, deterministic: bool,
                  name: str = "drop_mask"):
    """nn.Dropout-equivalent (bernoulli keep mask, x/keep scaling) whose
    mask tensor carries a checkpoint name, so the remat policy 'probs'
    (rollout.build_rollout) can SAVE the masks instead of regenerating
    them in the backward — the per-step PRNG mask generation is re-run
    under full remat and measured at ~7% of the DAgger step.

    Draw-stream note: the mask comes from `mod.make_rng('dropout')` at the
    caller's module path (nn.Dropout folds in its own child path), so the
    draws differ from nn.Dropout while the distribution is identical —
    same class of documented randomness divergence as the rbg PRNG
    default.  Deterministic mode is bit-identical (no mask at all)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(mod.make_rng("dropout"), keep, x.shape)
    mask = _ckpt_name(mask, name)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class _ProjWeights(nn.Module):
    """nn.Dense-compatible projection (same param tree <name>/{kernel,bias}
    and init) that can also hand out its raw weights, so the fused Pallas
    attention (ops/attention.pallas_fused_qkv_mha) can run the GEMM inside
    the kernel."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, weights_only: bool = False):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel.astype(self.dtype)
        b = bias.astype(self.dtype)
        if weights_only:
            return k, b
        return x.astype(self.dtype) @ k + b


class AttentionCore(nn.Module):
    """Scaled dot-product attention with q/k/v projections.

    Mirrors BertSelfAttention / RobertaSelfAttention
    (Bert_backbone.py:251-376, 439-578): bias is an additive float mask
    broadcastable to [B, H, Lq, Lk]; softmax is taken in float32.
    """

    num_heads: int
    head_dim: int
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, q_in, kv_in, bias=None, deterministic=True,
                 weights_only=False, kv_only=False, kv_cache=None):
        d = self.num_heads * self.head_dim
        qp = _ProjWeights(d, self.dtype, name="query")
        kp = _ProjWeights(d, self.dtype, name="key")
        vp = _ProjWeights(d, self.dtype, name="value")
        if kv_only:
            # K/V cache precompute: the cross-attended text is constant
            # across rollout steps, so its per-layer key/value projections
            # are hoisted out of the scan (exact same matmuls, done once)
            return kp(kv_in), vp(kv_in)

        # the fused kernel wins for mid-size query blocks (pano 52,
        # gmap 50) and loses for tiny ones (local branch 18) where XLA's
        # flattened [B*L, D] GEMMs are already efficient — gate by Lq
        min_lq = int(os.environ.get("GOAT_PALLAS_MIN_LQ", "32"))
        if (self.use_pallas and kv_cache is None
                and os.environ.get("GOAT_PALLAS_ATTN", "1") == "1"
                and q_in.shape[1] >= min_lq):
            from ..ops.attention import _default_interpret, \
                pallas_fused_qkv_mha

            # training path needs attention-prob dropout: available
            # in-kernel on real TPU (pltpu PRNG); in interpret mode
            # (CPU tests) fall back to the XLA path instead
            needs_drop = not deterministic and self.dropout_rate > 0.0
            if not needs_drop or not _default_interpret():
                seed, rate = None, 0.0
                if needs_drop:
                    rate = self.dropout_rate
                    seed = jax.random.randint(
                        self.make_rng("dropout"), (q_in.shape[0],),
                        0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
                wq, bq = qp(q_in, weights_only=True)
                wk, bk = kp(kv_in, weights_only=True)
                wv, bv = vp(kv_in, weights_only=True)
                return pallas_fused_qkv_mha(
                    q_in.astype(self.dtype), kv_in.astype(self.dtype),
                    wq, bq, wk, bk, wv, bv, bias,
                    num_heads=self.num_heads, dropout_rate=rate, seed=seed)

        q = qp(q_in)
        if kv_cache is not None:
            k, v = kv_cache
        else:
            k = kp(kv_in)
            v = vp(kv_in)
        B, Lq = q.shape[0], q.shape[1]
        Lk = k.shape[1]
        q = q.reshape(B, Lq, self.num_heads, self.head_dim)
        k = k.reshape(B, Lk, self.num_heads, self.head_dim)
        v = v.reshape(B, Lk, self.num_heads, self.head_dim)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.head_dim)
        if bias is not None:
            scores = scores + bias.astype(scores.dtype)
        # reference parity: softmax in float32 (Bert_backbone.py).  The
        # env flag measures the cost of that upcast on TPU (perf probe
        # only — bf16 softmax is a numerics divergence, keep it off).
        sm_dtype = jnp.bfloat16 if os.environ.get("GOAT_BF16_SOFTMAX") \
            else jnp.float32
        probs = jax.nn.softmax(scores.astype(sm_dtype), axis=-1).astype(self.dtype)
        # named so remat='probs' can save the softmax output (skips the
        # exp/normalize recompute in the backward) and the dropout mask
        probs = _ckpt_name(probs, "attn_probs")
        probs = named_dropout(self, probs, self.dropout_rate, deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return ctx.reshape(B, Lq, d)


class _LNWeights(nn.Module):
    """nn.LayerNorm-compatible (same param tree {scale, bias}, f32 stats,
    fast variance)."""

    epsilon: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu, 0.0)
        y = (x32 - mu) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


class BertSelfOutput(nn.Module):
    config: GoatConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, residual, deterministic=True):
        c = self.config
        dense = _ProjWeights(c.hidden_size, self.dtype, name="dense")
        ln = _LNWeights(c.layer_norm_eps, self.dtype, name="LayerNorm")
        h = dense(hidden)
        h = named_dropout(self, h, c.hidden_dropout_prob, deterministic)
        h = ln(h + residual)
        # layer-boundary tensor: the only thing remat='bounds' saves
        return _ckpt_name(h, "blk")


class BertAttention(nn.Module):
    """Self- or cross-attention block with post-LN output."""

    config: GoatConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, kv=None, bias=None, deterministic=True,
                 kv_only=False, kv_cache=None):
        c = self.config
        kv_in = hidden if kv is None else kv
        if kv_only:
            return AttentionCore(
                c.num_attention_heads, c.head_dim,
                c.attention_probs_dropout_prob, self.dtype,
                name="self")(kv_in, kv_in, kv_only=True)
        ctx = AttentionCore(
            c.num_attention_heads, c.head_dim,
            c.attention_probs_dropout_prob, self.dtype,
            use_pallas=getattr(c, "use_pallas_attention", False), name="self",
        )(hidden, kv_in, bias, deterministic, kv_cache=kv_cache)
        return BertSelfOutput(c, self.dtype, name="output")(
            ctx, hidden, deterministic)


class BertIntermediate(nn.Module):
    config: GoatConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden):
        c = self.config
        dense = _ProjWeights(c.intermediate_size, self.dtype, name="dense")
        h = dense(hidden)
        # named so remat='ffn' (rollout.build_rollout) can exclude the
        # 4x-wide tensors from the saved set and recompute only these
        h = _ckpt_name(h, "ffn_wide")
        return _ckpt_name(ACT2FN[c.hidden_act](h),
                                                 "ffn_wide")


class BertOutput(nn.Module):
    config: GoatConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, residual, deterministic=True):
        c = self.config
        dense = _ProjWeights(c.hidden_size, self.dtype, name="dense")
        ln = _LNWeights(c.layer_norm_eps, self.dtype, name="LayerNorm")
        h = dense(hidden)
        h = named_dropout(self, h, c.hidden_dropout_prob, deterministic)
        h = ln(h + residual)
        # layer-boundary tensor: the only thing remat='bounds' saves
        return _ckpt_name(h, "blk")


def _ffn_sublayer(parent, c, dtype, h, deterministic):
    """FFN sublayer shared by BertLayer/BertCrossLayer."""
    inter = BertIntermediate(c, dtype, name="intermediate")
    out_mod = BertOutput(c, dtype, name="output")
    return out_mod(inter(h), h, deterministic)


class BertLayer(nn.Module):
    """RobertaLayer / BertLayer: self-attn -> FFN (Bert_backbone.py:149-234)."""

    config: GoatConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, bias=None, deterministic=True):
        c = self.config
        attn_out = BertAttention(c, self.dtype, name="attention")(
            hidden, None, bias, deterministic)
        return _ffn_sublayer(self, c, self.dtype, attn_out, deterministic)


class BertCrossLayer(nn.Module):
    """BertCrossLayer (Bert_backbone.py:651-712): self-attn (with optional
    graph_sprels added to the additive mask, :675-676) -> cross-attn -> FFN."""

    config: GoatConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, enc_hidden, self_bias=None, cross_bias=None,
                 graph_sprels=None, deterministic=True, kv_only=False,
                 kv_cache=None):
        c = self.config
        if kv_only:
            # per-layer K/V projections of the (step-constant) encoder side
            return BertAttention(c, self.dtype, name="crossattention")(
                enc_hidden, None, kv_only=True)
        if graph_sprels is not None:
            self_bias = (0.0 if self_bias is None else self_bias) + graph_sprels
        h = BertAttention(c, self.dtype, name="attention")(
            hidden, None, self_bias, deterministic)
        h = BertAttention(c, self.dtype, name="crossattention")(
            h, enc_hidden, cross_bias, deterministic, kv_cache=kv_cache)
        return _ffn_sublayer(self, c, self.dtype, h, deterministic)


class CrossmodalEncoder(nn.Module):
    """Stack of BertCrossLayer (Bert_backbone.py:828-852).

    NOTE argument order matches the reference forward(q, q_masks, kv,
    kv_masks): queries first.
    """

    config: GoatConfig
    num_layers: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q_embeds, q_masks, kv_embeds, kv_masks,
                 graph_sprels=None, deterministic=True, kv_only=False,
                 kv_caches=None):
        n = self.num_layers if self.num_layers is not None else self.config.num_x_layers
        if kv_only:
            # list of per-layer (k, v) projections of kv_embeds — computed
            # once per episode and fed back via kv_caches in the scan
            return [BertCrossLayer(self.config, self.dtype,
                                   name=f"crossattention_{i}")(
                        None, kv_embeds, kv_only=True) for i in range(n)]
        self_bias = extend_neg_masks(q_masks) if q_masks is not None else None
        cross_bias = extend_neg_masks(kv_masks) if kv_masks is not None else None
        h = q_embeds
        for i in range(n):
            h = BertCrossLayer(self.config, self.dtype, name=f"crossattention_{i}")(
                h, kv_embeds, self_bias, cross_bias, graph_sprels, deterministic,
                kv_cache=None if kv_caches is None else kv_caches[i])
        return h


class TorchMultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention equivalent (packed qkv in torch; we keep
    separate q/k/v Dense — the checkpoint converter splits in_proj)."""

    num_heads: int
    head_dim: int
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in, key_padding_mask=None, deterministic=True):
        d = self.num_heads * self.head_dim
        q = _dense(d, "q_proj", self.dtype)(q_in)
        k = _dense(d, "k_proj", self.dtype)(k_in)
        v = _dense(d, "v_proj", self.dtype)(v_in)
        B, Lq, Lk = q.shape[0], q.shape[1], k.shape[1]
        q = q.reshape(B, Lq, self.num_heads, self.head_dim)
        k = k.reshape(B, Lk, self.num_heads, self.head_dim)
        v = v.reshape(B, Lk, self.num_heads, self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.head_dim)
        if key_padding_mask is not None:
            # torch semantics: True = ignore. Use -inf like torch MHA.
            neg = jnp.finfo(jnp.float32).min
            scores = jnp.where(key_padding_mask[:, None, None, :], neg, scores)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        probs = _ckpt_name(probs, "attn_probs")
        probs = named_dropout(self, probs, self.dropout_rate, deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, Lq, d)
        return _dense(d, "out_proj", self.dtype)(ctx)


class PanoEncoderLayer(nn.Module):
    """DETR pre-norm TransformerEncoderLayer (transformer.py:170-182).

    x2 = LN1(x); x += dropout(MHA(x2)); x2 = LN2(x); x += dropout(FFN(x2)).
    LayerNorm eps is the torch default 1e-5 here.
    """

    config: GoatConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, src, key_padding_mask=None, deterministic=True):
        c = self.config
        h = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=self.dtype)(src)
        h = TorchMultiheadAttention(
            c.num_attention_heads, c.head_dim, c.hidden_dropout_prob,
            self.dtype, name="self_attn",
        )(h, h, h, key_padding_mask, deterministic)
        src = src + named_dropout(self, h, c.hidden_dropout_prob,
                                  deterministic)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=self.dtype)(src)
        h = _dense(c.intermediate_size, "linear1", self.dtype)(h)
        h = _ckpt_name(h, "ffn_wide")
        h = _ckpt_name(ACT2FN[c.hidden_act](h),
                                              "ffn_wide")
        h = named_dropout(self, h, c.hidden_dropout_prob, deterministic)
        h = _ckpt_name(h, "ffn_wide")
        h = _dense(c.hidden_size, "linear2", self.dtype)(h)
        src = src + named_dropout(self, h, c.hidden_dropout_prob,
                                  deterministic)
        return src


class PanoEncoder(nn.Module):
    """create_transformer_encoder(..., norm=True) (models/ops.py:11-23):
    pre-norm DETR encoder stack + final BertLayerNorm(eps=1e-12)."""

    config: GoatConfig
    num_layers: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, src, key_padding_mask=None, deterministic=True):
        h = src
        for i in range(self.num_layers):
            h = PanoEncoderLayer(self.config, self.dtype, name=f"layers_{i}")(
                h, key_padding_mask, deterministic)
        h = nn.LayerNorm(epsilon=1e-12, name="norm", dtype=self.dtype)(h)
        return h


class BertPooler(nn.Module):
    """BertPooler (Bert_backbone.py:854-866): dense+tanh on one token."""

    config: GoatConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, location=0):
        first = hidden[:, location]
        return jnp.tanh(_dense(self.config.hidden_size, "dense", self.dtype)(first))


class BertPredictionHeadTransform(nn.Module):
    """dense -> act -> LayerNorm (Bert_backbone.py:868-882)."""

    config: GoatConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden):
        c = self.config
        h = _dense(c.hidden_size, "dense", self.dtype)(hidden)
        h = ACT2FN[c.hidden_act](h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="LayerNorm", dtype=self.dtype)(h)


class ClsPrediction(nn.Module):
    """vilmodel_GOAT.py:512-524: Linear -> ReLU -> LN(1e-12) -> Linear.

    torch names net.0 / net.2 / net.3 -> flax net_0 / net_2 / net_3.
    """

    config: GoatConfig
    input_size: Optional[int] = None
    output_size: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.config
        h = _dense(c.hidden_size, "net_0", self.dtype)(x)
        h = jax.nn.relu(h)
        h = nn.LayerNorm(epsilon=1e-12, name="net_2", dtype=self.dtype)(h)
        return _dense(self.output_size, "net_3", self.dtype)(h)
