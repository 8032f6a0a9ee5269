"""Fused attention-sublayer Pallas kernel (pallas_fused_attn_block):
forward and gradients match the unfused XLA path exactly (no dropout, f32)
on CPU interpret mode.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vln_goat_tpu.ops.attention import pallas_fused_attn_block

B, Lq, Lk, D, H = 3, 20, 14, 32, 4


@pytest.fixture(scope="module")
def args():
    rng = np.random.default_rng(0)

    def r(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.3)

    x = r(B, Lq, D)
    y = r(B, Lk, D)
    wq, wk, wv, wo = r(D, D), r(D, D), r(D, D), r(D, D)
    bq, bk, bv, bo = r(D), r(D), r(D), r(D)
    gamma = jnp.ones((D,)) + r(D) * 0.1
    beta = r(D)
    mask = rng.random((B, 1, 1, Lk)) < 0.8
    bias = jnp.where(jnp.asarray(mask), 0.0, -10000.0)
    return dict(x=x, y=y, wq=wq, bq=bq, wk=wk, bk=bk, wv=wv, bv=bv,
                wo=wo, bo=bo, gamma=gamma, beta=beta, bias=bias)


def _ref(a, eps=1e-12):
    """Unfused reference: AttentionCore + BertSelfOutput semantics."""
    import math

    x, y = a["x"], a["y"]
    q = (x @ a["wq"] + a["bq"]).reshape(B, Lq, H, D // H)
    k = (y @ a["wk"] + a["bk"]).reshape(B, Lk, H, D // H)
    v = (y @ a["wv"] + a["bv"]).reshape(B, Lk, H, D // H)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(D // H)
    s = s + a["bias"]
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, Lq, D)
    h = ctx @ a["wo"] + a["bo"]
    r = h + x
    mu = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean((r - mu) ** 2, axis=-1, keepdims=True)
    return (r - mu) * jax.lax.rsqrt(var + eps) * a["gamma"] + a["beta"]


def _fused(a):
    return pallas_fused_attn_block(
        a["x"], a["y"], a["wq"], a["bq"], a["wk"], a["bk"], a["wv"],
        a["bv"], a["wo"], a["bo"], a["gamma"], a["beta"], a["bias"],
        num_heads=H, interpret=True)


def test_forward_matches_unfused(args):
    out = np.asarray(_fused(args))
    ref = np.asarray(_ref(args))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_gradients_match_unfused(args):
    keys = ["x", "y", "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
            "gamma", "beta", "bias"]

    def loss_fused(vals):
        a = {**args, **dict(zip(keys, vals))}
        o = _fused(a)
        return jnp.sum(jnp.sin(o * 0.3))

    def loss_ref(vals):
        a = {**args, **dict(zip(vals and keys, vals))}
        o = _ref(a)
        return jnp.sum(jnp.sin(o * 0.3))

    vals = [args[k] for k in keys]
    gf = jax.grad(loss_fused)(vals)
    gr = jax.grad(loss_ref)(vals)
    for k, a_, b_ in zip(keys, gf, gr):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=3e-4, rtol=3e-4, err_msg=k)


def test_cross_attention_shapes(args):
    # self-attention variant (y = x) and no-bias variant both run
    a = dict(args)
    a["y"] = a["x"]
    out = pallas_fused_attn_block(
        a["x"], a["x"], a["wq"], a["bq"], a["wk"], a["bk"], a["wv"],
        a["bv"], a["wo"], a["bo"], a["gamma"], a["beta"], None,
        num_heads=H, interpret=True)
    assert out.shape == (B, Lq, D)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# Fused FFN sublayer


def _ffn_args():
    from vln_goat_tpu.ops.attention import pallas_fused_ffn_block  # noqa

    rng = np.random.default_rng(1)

    def r(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.2)

    F = 64
    return dict(x=r(B, Lq, D), w1=r(D, F), b1=r(F), w2=r(F, D), b2=r(D),
                gamma=jnp.ones((D,)) + r(D) * 0.1, beta=r(D))


def _ffn_ref(a, eps=1e-12):
    from vln_goat_tpu.ops.activations import gelu_erf

    pre = a["x"] @ a["w1"] + a["b1"]
    h = gelu_erf(pre) @ a["w2"] + a["b2"]
    r = h + a["x"]
    mu = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean((r - mu) ** 2, axis=-1, keepdims=True)
    return (r - mu) * jax.lax.rsqrt(var + eps) * a["gamma"] + a["beta"]


def _ffn_fused(a):
    from vln_goat_tpu.ops.attention import pallas_fused_ffn_block

    return pallas_fused_ffn_block(a["x"], a["w1"], a["b1"], a["w2"],
                                  a["b2"], a["gamma"], a["beta"],
                                  interpret=True)


def test_ffn_forward_matches_unfused():
    a = _ffn_args()
    np.testing.assert_allclose(np.asarray(_ffn_fused(a)),
                               np.asarray(_ffn_ref(a)),
                               atol=2e-5, rtol=2e-5)


def test_ffn_gradients_match_unfused():
    a = _ffn_args()
    keys = ["x", "w1", "b1", "w2", "b2", "gamma", "beta"]

    def lf(vals):
        return jnp.sum(jnp.cos(_ffn_fused({**a, **dict(zip(keys, vals))})))

    def lr(vals):
        return jnp.sum(jnp.cos(_ffn_ref({**a, **dict(zip(keys, vals))})))

    vals = [a[k] for k in keys]
    gf = jax.grad(lf)(vals)
    gr = jax.grad(lr)(vals)
    for k, x_, y_ in zip(keys, gf, gr):
        np.testing.assert_allclose(np.asarray(x_), np.asarray(y_),
                                   atol=3e-4, rtol=3e-4, err_msg=k)


# ---------------------------------------------------------------------------
# Row-blocked variants (rb > 1): the production grids fold several batch
# rows into one block (GOAT_PALLAS_ATTN_RB / GOAT_PALLAS_FFN_RB); cross-row
# attention is forbidden by a block-diagonal bias.  Exactness must hold for
# any rb, including rb that doesn't divide B evenly (gcd fallback).


def test_row_blocked_attention_matches(monkeypatch, args):
    B4 = 4
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((B4, Lq, D)).astype(np.float32) * 0.3)
    y = jnp.asarray(rng.standard_normal((B4, Lk, D)).astype(np.float32) * 0.3)
    mask = rng.random((B4, 1, 1, Lk)) < 0.8
    bias = jnp.where(jnp.asarray(mask), 0.0, -10000.0)
    a = {**args, "x": x, "y": y, "bias": bias}

    def fwd():
        return pallas_fused_attn_block(
            a["x"], a["y"], a["wq"], a["bq"], a["wk"], a["bk"], a["wv"],
            a["bv"], a["wo"], a["bo"], a["gamma"], a["beta"], a["bias"],
            num_heads=H, interpret=True)

    monkeypatch.setenv("GOAT_PALLAS_ATTN_RB", "1")
    ref = np.asarray(fwd())
    monkeypatch.setenv("GOAT_PALLAS_ATTN_RB", "4")
    out = np.asarray(fwd())
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    # gradients through the blocked grid
    def loss(x_, rbv):
        monkeypatch.setenv("GOAT_PALLAS_ATTN_RB", rbv)
        o = pallas_fused_attn_block(
            x_, a["y"], a["wq"], a["bq"], a["wk"], a["bk"], a["wv"],
            a["bv"], a["wo"], a["bo"], a["gamma"], a["beta"], a["bias"],
            num_heads=H, interpret=True)
        return jnp.sum(jnp.sin(o * 0.3))

    g1 = jax.grad(loss)(x, "1")
    g4 = jax.grad(loss)(x, "4")
    np.testing.assert_allclose(np.asarray(g4), np.asarray(g1),
                               atol=3e-4, rtol=3e-4)


def test_row_blocked_ffn_matches(monkeypatch):
    a = _ffn_args()
    B8 = 8
    rng = np.random.default_rng(9)
    a["x"] = jnp.asarray(
        rng.standard_normal((B8, Lq, D)).astype(np.float32) * 0.2)

    monkeypatch.setenv("GOAT_PALLAS_FFN_RB", "1")
    ref = np.asarray(_ffn_fused(a))
    monkeypatch.setenv("GOAT_PALLAS_FFN_RB", "8")
    out = np.asarray(_ffn_fused(a))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)
