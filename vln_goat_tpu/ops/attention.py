"""Fused multi-head attention Pallas kernel.

One kernel per (batch, head): scores = qk^T/sqrt(d) + bias -> softmax ->
out = probs @ v, entirely in VMEM.  GOAT's attention shapes are tiny
(<= 256 keys, head_dim 64 — instruction <=200 tokens, panorama <=72,
gmap <=100, SURVEY.md section 5 long-context note), so the whole slice
fits on-chip and the win over unfused XLA is avoiding the HBM round-trip
of the [B, H, Lq, Lk] score tensor between the two matmuls.

Used by models/layers.AttentionCore when GoatConfig.use_pallas_attention
is set and the call is deterministic (attention-prob dropout needs the
XLA path); falls back transparently otherwise.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

def _default_interpret() -> bool:
    """Interpret mode off TPU so the kernel runs anywhere (tests, CPU)."""
    return jax.default_backend() != "tpu"


def _mha_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)            # [Lq, dh]
    k = k_ref[0].astype(jnp.float32)            # [Lk, dh]
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if bias_ref is not None:
        s = s + bias_ref[0].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_mha_impl(q, k, v, bias=None, interpret: bool = False):
    """q [B, Lq, H, dh], k/v [B, Lk, H, dh], bias broadcastable to
    [B, H, Lq, Lk] (additive) -> [B, Lq, H*dh].  fp32 softmax inside."""
    B, Lq, H, dh = q.shape
    Lk = k.shape[1]
    qt = q.transpose(0, 2, 1, 3).reshape(B * H, Lq, dh)
    kt = k.transpose(0, 2, 1, 3).reshape(B * H, Lk, dh)
    vt = v.transpose(0, 2, 1, 3).reshape(B * H, Lk, dh)

    in_specs = [
        pl.BlockSpec((1, Lq, dh), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, Lk, dh), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, Lk, dh), lambda i: (i, 0, 0)),
    ]
    args = [qt, kt, vt]
    if bias is not None:
        bias = jnp.broadcast_to(bias, (B, H, Lq, Lk)).reshape(B * H, Lq, Lk)
        in_specs.append(pl.BlockSpec((1, Lq, Lk), lambda i: (i, 0, 0)))
        args.append(bias)
        kernel = functools.partial(_mha_kernel, scale=1.0 / math.sqrt(dh))
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, orf, scale: _mha_kernel(qr, kr, vr, None, orf,
                                                       scale=scale),
            scale=1.0 / math.sqrt(dh))

    out = pl.pallas_call(
        kernel,
        grid=(B * H,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Lq, dh), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq, dh), q.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(B, H, Lq, dh).transpose(0, 2, 1, 3).reshape(
        B, Lq, H * dh)


def pallas_mha(q, k, v, bias=None, interpret=None):
    if interpret is None:
        interpret = _default_interpret()
    return _pallas_mha_impl(q, k, v, bias, interpret=interpret)


# ---------------------------------------------------------------------------
# Fused q/k/v projections + attention: one kernel per batch row.  Round-1
# A/B showed the attention-only kernel losing end-to-end because the
# pallas_call boundary stops XLA from fusing the projections and layout
# changes into it (bench.py note); this variant moves the three GEMMs and
# the head split/merge inside, so the [L, 3D] projections, the score
# tensor, and the head-merged context never round-trip HBM.


def _fused_qkv_kernel(x_ref, y_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                      wv_ref, bv_ref, bias_ref, o_ref, *, H, dh, scale):
    x = x_ref[0]                                   # [Lq, D]
    y = y_ref[0]                                   # [Lk, D]
    Lq, Lk = x.shape[0], y.shape[0]
    q = jnp.dot(x, wq_ref[:],
                preferred_element_type=jnp.float32) + bq_ref[:]
    k = jnp.dot(y, wk_ref[:],
                preferred_element_type=jnp.float32) + bk_ref[:]
    v = jnp.dot(y, wv_ref[:],
                preferred_element_type=jnp.float32) + bv_ref[:]
    q = q.reshape(Lq, H, dh).transpose(1, 0, 2)    # [H, Lq, dh]
    k = k.reshape(Lk, H, dh).transpose(1, 0, 2)
    v = v.reshape(Lk, H, dh).transpose(1, 0, 2)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    if bias_ref is not None:
        s = s + bias_ref[0].astype(jnp.float32)    # [Hb, Lq, Lk], Hb in {1,H}
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.transpose(1, 0, 2).reshape(Lq, H * dh).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "interpret"))
def _fused_qkv_mha_impl(x, y, wq, bq, wk, bk, wv, bv, bias=None,
                        num_heads: int = 12, interpret: bool = False):
    B, Lq, D = x.shape
    Lk = y.shape[1]
    H = num_heads
    dh = wq.shape[1] // H
    in_specs = [
        pl.BlockSpec((1, Lq, D), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, Lk, D), lambda i: (i, 0, 0)),
        pl.BlockSpec(wq.shape, lambda i: (0, 0)),
        pl.BlockSpec(bq.shape, lambda i: (0,)),
        pl.BlockSpec(wk.shape, lambda i: (0, 0)),
        pl.BlockSpec(bk.shape, lambda i: (0,)),
        pl.BlockSpec(wv.shape, lambda i: (0, 0)),
        pl.BlockSpec(bv.shape, lambda i: (0,)),
    ]
    args = [x, y, wq, bq, wk, bk, wv, bv]
    scale = 1.0 / math.sqrt(dh)
    if bias is not None:
        # keep a singleton head dim when the mask is head-independent (the
        # common padding-mask / sprel case) so the HBM block stays small
        Hb = H if (bias.ndim == 4 and bias.shape[1] == H) else 1
        bias = jnp.broadcast_to(bias, (B, Hb, Lq, Lk))
        in_specs.append(pl.BlockSpec((1, Hb, Lq, Lk),
                                     lambda i: (i, 0, 0, 0)))
        args.append(bias)
        kernel = functools.partial(_fused_qkv_kernel, H=H, dh=dh,
                                   scale=scale)
    else:
        kernel = functools.partial(
            lambda xr, yr, wqr, bqr, wkr, bkr, wvr, bvr, orf, H, dh, scale:
            _fused_qkv_kernel(xr, yr, wqr, bqr, wkr, bkr, wvr, bvr, None,
                              orf, H=H, dh=dh, scale=scale),
            H=H, dh=dh, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Lq, H * dh), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Lq, H * dh), x.dtype),
        interpret=interpret,
    )(*args)
    return out


def pallas_fused_qkv_mha(x, y, wq, bq, wk, bk, wv, bv, bias=None,
                         num_heads: int = 12, interpret=None):
    """x [B, Lq, D] (query side), y [B, Lk, D] (key/value side), projection
    weights [D, H*dh] (+ biases), additive mask broadcastable to
    [B, {1,H}, {1,Lq}, Lk] -> [B, Lq, H*dh]."""
    if interpret is None:
        interpret = _default_interpret()
    return _fused_qkv_mha_impl(x, y, wq, bq, wk, bk, wv, bv, bias,
                               num_heads=num_heads, interpret=interpret)
