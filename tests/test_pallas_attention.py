"""Pallas fused attention vs the XLA reference path (interpret mode on CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vln_goat_tpu.ops.attention import pallas_mha


def _xla_ref(q, k, v, bias):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(q.shape[-1])
    if bias is not None:
        s = s + bias
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    B, Lq, H, dh = q.shape
    return ctx.reshape(B, Lq, H * dh)


@pytest.mark.parametrize("Lq,Lk,bias_kind", [
    (16, 16, None), (24, 40, "key"), (12, 12, "full")])
def test_pallas_mha_matches_xla(rng, Lq, Lk, bias_kind):
    B, H, dh = 2, 4, 8
    q = jnp.asarray(rng.standard_normal((B, Lq, H, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Lk, H, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, Lk, H, dh)).astype(np.float32))
    if bias_kind is None:
        bias = None
    elif bias_kind == "key":
        mask = rng.random((B, Lk)) < 0.8
        bias = jnp.asarray(((1.0 - mask) * -10000.0)
                           .astype(np.float32))[:, None, None, :]
    else:
        bias = jnp.asarray(rng.standard_normal(
            (B, H, Lq, Lk)).astype(np.float32))
    out = pallas_mha(q, k, v, bias, interpret=True)
    ref = _xla_ref(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_model_with_pallas_flag_matches_plain(rng, monkeypatch):
    """GoatModel(use_pallas_attention=True) must produce identical text
    embeddings in interpret/CPU mode (the fused-qkv kernel path; the
    Lq gate is lowered so the 10-token test sequence still uses it)."""
    from vln_goat_tpu.config import GoatConfig
    from vln_goat_tpu.models.goat import GoatModel

    monkeypatch.setenv("GOAT_PALLAS_MIN_LQ", "1")
    if True:
        kw = dict(num_l_layers=1, num_x_layers=1, num_pano_layers=1,
                  hidden_size=32, num_attention_heads=2, intermediate_size=64,
                  vocab_size=64, max_position_embeddings=64,
                  image_feat_size=16, hidden_dropout_prob=0.0,
                  attention_probs_dropout_prob=0.0)
        m0 = GoatModel(GoatConfig(**kw))
        m1 = GoatModel(GoatConfig(use_pallas_attention=True, **kw))
        ids = jnp.asarray(rng.integers(0, 64, (2, 10)))
        mask = jnp.ones((2, 10), bool)
        var = m0.init(jax.random.PRNGKey(0), ids, mask,
                      method=GoatModel.forward_text)
        o0 = m0.apply(var, ids, mask, method=GoatModel.forward_text)
        o1 = m1.apply(var, ids, mask, method=GoatModel.forward_text)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), atol=2e-5,
                                   rtol=1e-4)


@pytest.mark.parametrize("Lq,Lk,bias_kind", [
    (16, 16, None), (24, 40, "key"), (12, 12, "full")])
def test_fused_qkv_mha_matches_xla(rng, Lq, Lk, bias_kind):
    """The folded-projection kernel (pallas_fused_qkv_mha) equals
    project-then-attend."""
    from vln_goat_tpu.ops.attention import pallas_fused_qkv_mha

    B, H, dh, D = 2, 4, 8, 24
    d = H * dh
    x = jnp.asarray(rng.standard_normal((B, Lq, D)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((B, Lk, D)).astype(np.float32))
    ws = [jnp.asarray(rng.standard_normal((D, d)).astype(np.float32) * 0.1)
          for _ in range(3)]
    bs = [jnp.asarray(rng.standard_normal((d,)).astype(np.float32) * 0.1)
          for _ in range(3)]
    if bias_kind is None:
        bias = None
    elif bias_kind == "key":
        mask = rng.random((B, Lk)) < 0.8
        bias = jnp.asarray(((1.0 - mask) * -10000.0)
                           .astype(np.float32))[:, None, None, :]
    else:
        bias = jnp.asarray(rng.standard_normal(
            (B, H, Lq, Lk)).astype(np.float32))
    out = pallas_fused_qkv_mha(x, y, ws[0], bs[0], ws[1], bs[1], ws[2],
                               bs[2], bias, num_heads=H, interpret=True)
    q = (x @ ws[0] + bs[0]).reshape(B, Lq, H, dh)
    k = (y @ ws[1] + bs[1]).reshape(B, Lk, H, dh)
    v = (y @ ws[2] + bs[2]).reshape(B, Lk, H, dh)
    ref = _xla_ref(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5,
                               rtol=1e-4)
