"""Numerical parity of our flax blocks vs the public HF/torch blocks the
reference is built from (transformers.RobertaLayer, torch.nn.MultiheadAttention).

The reference model (map_nav_src/models/Bert_backbone.py) is a hand copy of
HF's RobertaLayer — so matching HF at float32 within ~1e-5 certifies that a
converted reference checkpoint will produce the same activations.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vln_goat_tpu.config import GoatConfig
from vln_goat_tpu.models import layers as L
from vln_goat_tpu.ops.masks import extend_neg_masks

torch = pytest.importorskip("torch")

# Frozen-parity certification vs HF torch blocks (~22s of HF model builds):
# slow tier.  The fast tier still guards model numerics via the golden
# reference-parity fixtures (test_reference_parity.py) and episode parity.
pytestmark = pytest.mark.slow

CFG = GoatConfig(hidden_size=96, num_attention_heads=4, intermediate_size=192,
                 layer_norm_eps=1e-5, hidden_dropout_prob=0.0,
                 attention_probs_dropout_prob=0.0)


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def _hf_config():
    from transformers import RobertaConfig
    return RobertaConfig(
        attn_implementation="eager",
        hidden_size=CFG.hidden_size,
        num_attention_heads=CFG.num_attention_heads,
        intermediate_size=CFG.intermediate_size,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-5,
        hidden_act="gelu",
        is_decoder=False,
        add_cross_attention=False,
        chunk_size_feed_forward=0,
    )


def _copy_bert_layer_params(tl):
    """Map torch RobertaLayer state-dict -> our BertLayer param tree."""
    sd = {k: t2j(v) for k, v in tl.state_dict().items()}

    def lin(prefix):
        return {"kernel": sd[prefix + ".weight"].T, "bias": sd[prefix + ".bias"]}

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    return {
        "attention": {
            "self": {
                "query": lin("attention.self.query"),
                "key": lin("attention.self.key"),
                "value": lin("attention.self.value"),
            },
            "output": {
                "dense": lin("attention.output.dense"),
                "LayerNorm": ln("attention.output.LayerNorm"),
            },
        },
        "intermediate": {"dense": lin("intermediate.dense")},
        "output": {
            "dense": lin("output.dense"),
            "LayerNorm": ln("output.LayerNorm"),
        },
    }


def test_bert_layer_matches_hf_roberta_layer(rng):
    from transformers.models.roberta.modeling_roberta import RobertaLayer

    torch.manual_seed(0)
    tl = RobertaLayer(_hf_config()).eval()

    B, Lq = 3, 11
    x = rng.standard_normal((B, Lq, CFG.hidden_size)).astype(np.float32)
    mask = np.ones((B, Lq), bool)
    mask[1, 7:] = False

    with torch.no_grad():
        tmask = (1.0 - torch.from_numpy(mask).float()[:, None, None, :]) * -10000.0
        ref = tl(torch.from_numpy(x), tmask)[0].numpy()

    ours_mod = L.BertLayer(CFG)
    params = {"params": _copy_bert_layer_params(tl)}
    bias = extend_neg_masks(jnp.asarray(mask))
    out = ours_mod.apply(params, jnp.asarray(x), bias)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_cross_attention_matches_hf(rng):
    """Our BertAttention in cross mode vs HF RobertaAttention with
    encoder_hidden_states."""
    from transformers.models.roberta.modeling_roberta import RobertaAttention

    torch.manual_seed(1)
    ta = RobertaAttention(_hf_config()).eval()
    B, Lq, Lk = 2, 7, 13
    q = rng.standard_normal((B, Lq, CFG.hidden_size)).astype(np.float32)
    kv = rng.standard_normal((B, Lk, CFG.hidden_size)).astype(np.float32)
    kv_mask = np.ones((B, Lk), bool)
    kv_mask[0, 9:] = False

    with torch.no_grad():
        # HF >= 4.5x dropped encoder_* kwargs from RobertaAttention; replicate
        # the reference cross-attention math (Bert_backbone.py:294-376) with
        # the HF module's own weights.
        tmask = (1.0 - torch.from_numpy(kv_mask).float()[:, None, None, :]) * -10000.0
        tq, tkv = torch.from_numpy(q), torch.from_numpy(kv)
        H, dh = CFG.num_attention_heads, CFG.head_dim

        def split(t):
            return t.view(t.shape[0], t.shape[1], H, dh).permute(0, 2, 1, 3)

        ql = split(ta.self.query(tq))
        kl = split(ta.self.key(tkv))
        vl = split(ta.self.value(tkv))
        scores = ql @ kl.transpose(-1, -2) / (dh ** 0.5) + tmask
        probs = torch.softmax(scores, dim=-1)
        ctx = (probs @ vl).permute(0, 2, 1, 3).reshape(B, Lq, H * dh)
        ref = ta.output(ctx, tq).numpy()

    sd = {k: t2j(v) for k, v in ta.state_dict().items()}

    def lin(p):
        return {"kernel": sd[p + ".weight"].T, "bias": sd[p + ".bias"]}

    params = {"params": {
        "self": {"query": lin("self.query"), "key": lin("self.key"),
                 "value": lin("self.value")},
        "output": {"dense": lin("output.dense"),
                   "LayerNorm": {"scale": sd["output.LayerNorm.weight"],
                                 "bias": sd["output.LayerNorm.bias"]}},
    }}
    bias = extend_neg_masks(jnp.asarray(kv_mask))
    out = L.BertAttention(CFG).apply(params, jnp.asarray(q), jnp.asarray(kv), bias)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_pano_encoder_layer_matches_torch_prenorm(rng):
    """Our PanoEncoderLayer vs a pre-norm layer assembled from torch.nn
    primitives exactly as DETR's TransformerEncoderLayer.forward_pre does
    (reference map_nav_src/models/transformer.py:170-182)."""
    D, H, FF = CFG.hidden_size, CFG.num_attention_heads, CFG.intermediate_size
    torch.manual_seed(2)
    mha = torch.nn.MultiheadAttention(D, H, dropout=0.0)
    linear1 = torch.nn.Linear(D, FF)
    linear2 = torch.nn.Linear(FF, D)
    norm1 = torch.nn.LayerNorm(D)
    norm2 = torch.nn.LayerNorm(D)

    B, Lq = 2, 9
    x = rng.standard_normal((B, Lq, D)).astype(np.float32)
    pad = np.zeros((B, Lq), bool)
    pad[1, 6:] = True  # torch convention: True = pad

    with torch.no_grad():
        src = torch.from_numpy(x).transpose(0, 1)  # [L, B, D]
        s2 = norm1(src)
        s2 = mha(s2, s2, s2, key_padding_mask=torch.from_numpy(pad))[0]
        src = src + s2
        s2 = norm2(src)
        s2 = linear2(torch.nn.functional.gelu(linear1(s2)))
        ref = (src + s2).transpose(0, 1).numpy()

    ipw = t2j(mha.in_proj_weight)
    ipb = t2j(mha.in_proj_bias)
    params = {"params": {
        "self_attn": {
            "q_proj": {"kernel": ipw[:D].T, "bias": ipb[:D]},
            "k_proj": {"kernel": ipw[D:2 * D].T, "bias": ipb[D:2 * D]},
            "v_proj": {"kernel": ipw[2 * D:].T, "bias": ipb[2 * D:]},
            "out_proj": {"kernel": t2j(mha.out_proj.weight).T,
                         "bias": t2j(mha.out_proj.bias)},
        },
        "linear1": {"kernel": t2j(linear1.weight).T, "bias": t2j(linear1.bias)},
        "linear2": {"kernel": t2j(linear2.weight).T, "bias": t2j(linear2.bias)},
        "norm1": {"scale": t2j(norm1.weight), "bias": t2j(norm1.bias)},
        "norm2": {"scale": t2j(norm2.weight), "bias": t2j(norm2.bias)},
    }}
    out = L.PanoEncoderLayer(CFG).apply(
        params, jnp.asarray(x), key_padding_mask=jnp.asarray(pad))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_roberta_embeddings_match_hf(rng):
    from transformers.models.roberta.modeling_roberta import RobertaEmbeddings
    from vln_goat_tpu.models.backbone import RobertaEmbeddings as Ours

    cfg = _hf_config()
    cfg.vocab_size = 120
    cfg.max_position_embeddings = 40
    cfg.type_vocab_size = 1
    cfg.pad_token_id = 1
    torch.manual_seed(3)
    te = RobertaEmbeddings(cfg).eval()

    B, Lq = 2, 12
    ids = rng.integers(0, 120, (B, Lq)).astype(np.int64)

    with torch.no_grad():
        # the reference calls embeddings with explicit zero token_type_ids and
        # default (arange) position ids (Bert_backbone.py:94-102)
        tids = torch.from_numpy(ids)
        pos = torch.arange(Lq)[None].expand(B, Lq)
        ref = te(tids, token_type_ids=torch.zeros_like(tids),
                 position_ids=pos).numpy()

    mycfg = GoatConfig(vocab_size=120, hidden_size=CFG.hidden_size,
                       max_position_embeddings=40, type_vocab_size=1,
                       hidden_dropout_prob=0.0)
    sd = {k: t2j(v) for k, v in te.state_dict().items()}
    params = {"params": {
        "word_embeddings": {"embedding": sd["word_embeddings.weight"]},
        "position_embeddings": {"embedding": sd["position_embeddings.weight"]},
        "token_type_embeddings": {"embedding": sd["token_type_embeddings.weight"]},
        "LayerNorm": {"scale": sd["LayerNorm.weight"], "bias": sd["LayerNorm.bias"]},
    }}
    out = Ours(mycfg).apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)
