"""Fused multi-head attention Pallas kernels.

Two entry points:

- `pallas_mha(q, k, v, bias)` — attention only, one kernel per
  (batch, head); kept for A/B comparisons.
- `pallas_fused_qkv_mha(x, y, wq, bq, ...)` — q/k/v projections + all
  heads' attention in ONE kernel per batch row, with a custom-VJP backward
  kernel (recompute-in-kernel, flash-attention style) and optional
  in-kernel attention-prob dropout via the TPU PRNG.  This is the
  training-path kernel: profiling the DAgger step showed the per-head
  [L,64]x[64,L] score/context matmuls and the [B,H,Lq,Lk] prob tensors
  dominating the attention cost at GOAT's tiny sequence lengths
  (gmap <= 100, pano <= 72, text <= 200 tokens — SURVEY.md section 5), so
  everything stays in VMEM for the whole row.

Mosaic notes: the kernel never reshapes across the lane dimension (the
head split is done OUTSIDE via XLA: weights enter as [H, D, dh]); each
head's work is plain 2-D dots, unrolled over H.  Weight gradients are
accumulated across the sequential TPU grid into revisited output blocks.

Used by models/layers.AttentionCore when GoatConfig.use_pallas_attention
is set; falls back transparently to the XLA path otherwise.  RNG note:
in-kernel dropout draws from the TPU PRNG stream, not jax.random's
threefry — same Bernoulli(rate) distribution, different draws (randomness
parity policy: documented divergence, SURVEY.md section 7).
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is only importable where the TPU plugin exists
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


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
# Fused q/k/v projections + all-head attention, forward + backward.


def _keep_mask(shape, rate):
    bits = pltpu.prng_random_bits(shape)
    thresh = jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
    return pltpu.bitcast(bits, jnp.uint32) >= thresh


def _bdot(a, b, ca, cb, batch=True, f32=True, dt=None):
    """Batched (over leading H) dot_general shorthand.

    dt: cast both operands to this dtype before the dot.  On chip the
    block dtype is bf16 — an f32 operand (activations that passed through
    a bias add / softmax / LN, all computed in f32) would otherwise force
    the MXU into multi-pass f32 matmuls, several times slower than the
    bf16-in/f32-accumulate native rate XLA uses for the same dense.  The
    f32 `preferred_element_type` keeps full-precision accumulation; in
    the CPU/interpret parity tests the model dtype is f32 so the casts
    are no-ops and exactness is untouched."""
    if dt is not None:
        a = a.astype(dt)
        b = b.astype(dt)
    dn = (((ca,), (cb,)), (((0,), (0,)) if batch else ((), ())))
    return jax.lax.dot_general(
        a, b, dn, preferred_element_type=jnp.float32 if f32 else None)


def _fa_qkv(x, y, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref):
    """Projections for all heads as three batched dots.
    x [Lq, D], weights [H, D, dh], biases [H, dh, 1] ->
    q [H, dh, Lq], k [H, dh, Lk], v [H, dh, Lk]."""
    q = _bdot(wq_ref[...], x, 1, 1, batch=False) + bq_ref[...]
    k = _bdot(wk_ref[...], y, 1, 1, batch=False) + bk_ref[...]
    v = _bdot(wv_ref[...], y, 1, 1, batch=False) + bv_ref[...]
    return q, k, v


def _fa_probs(q, k, bias_ref, seed_ref, *, Hb, scale, drop,
              seed_inside=True, dt=None):
    """scores -> softmax -> (optional) in-kernel dropout.
    Returns (p, pd, keep): pre-dropout probs, dropped probs, keep mask.
    seed_inside=False when the caller seeded the PRNG already (the fused
    block kernel draws several masks from one per-row seed)."""
    s = _bdot(q, k, 1, 1, dt=dt) * scale               # [H, Lq, Lk]
    s = s + bias_ref[0].astype(jnp.float32)            # [Hb, Lq, Lk] bcast
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    if drop > 0.0:
        if seed_inside:
            pltpu.prng_seed(seed_ref[pl.program_id(0)])
        keep = _keep_mask(p.shape, drop)
        pd = jnp.where(keep, p * (1.0 / (1.0 - drop)), 0.0)
        return p, pd, keep
    return p, p, None


def _fa_fwd_kernel(x_ref, y_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                   wv_ref, bv_ref, bias_ref, seed_ref, o_ref,
                   *, H, Hb, scale, drop):
    x = x_ref[0]                                       # [Lq, D]
    y = y_ref[0]                                       # [Lk, D]
    q, k, v = _fa_qkv(x, y, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref)
    _, pd, _ = _fa_probs(q, k, bias_ref, seed_ref, Hb=Hb, scale=scale,
                         drop=drop, dt=x.dtype)
    o = _bdot(pd, v, 2, 2, dt=x.dtype)                 # [H, Lq, dh]
    o_ref[0] = o.astype(o_ref.dtype)


def _fa_bwd_kernel(x_ref, y_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                   wv_ref, bv_ref, bias_ref, seed_ref, do_ref,
                   dx_ref, dy_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref,
                   dwv_ref, dbv_ref, dbias_ref,
                   *, H, Hb, scale, drop):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dbq_ref[...] = jnp.zeros_like(dbq_ref)
        dwk_ref[...] = jnp.zeros_like(dwk_ref)
        dbk_ref[...] = jnp.zeros_like(dbk_ref)
        dwv_ref[...] = jnp.zeros_like(dwv_ref)
        dbv_ref[...] = jnp.zeros_like(dbv_ref)

    x = x_ref[0]
    y = y_ref[0]
    inv_keep = 1.0 / (1.0 - drop) if drop > 0.0 else 1.0
    # recompute the forward (cheaper than saving probs through HBM)
    dt = x.dtype
    q, k, v = _fa_qkv(x, y, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref)
    p, pd, keep = _fa_probs(q, k, bias_ref, seed_ref, Hb=Hb, scale=scale,
                            drop=drop, dt=dt)
    dO = do_ref[0].astype(jnp.float32)                 # [H, Lq, dh]
    dv = _bdot(dO, pd, 1, 1, dt=dt)                    # [H, dh, Lk]
    dpd = _bdot(dO, v, 2, 1, dt=dt)                    # [H, Lq, Lk]
    dp = jnp.where(keep, dpd * inv_keep, 0.0) if keep is not None else dpd
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    if Hb > 1:
        dbias_ref[0] = ds.astype(dbias_ref.dtype)
    else:
        dbias_ref[0] = jnp.sum(ds, axis=0,
                               keepdims=True).astype(dbias_ref.dtype)
    dss = ds * scale
    dq = _bdot(dss, k, 2, 2, dt=dt)                    # [H, Lq, dh]
    dk = _bdot(dss, q, 1, 2, dt=dt)                    # [H, Lk, dh]
    dx = jnp.sum(_bdot(dq, wq_ref[...], 2, 2, dt=dt), axis=0)    # [Lq, D]
    dy = jnp.sum(_bdot(dk, wk_ref[...], 2, 2, dt=dt), axis=0) \
        + jnp.sum(_bdot(dv, wv_ref[...], 1, 2, dt=dt), axis=0)   # [Lk, D]
    dx_ref[0] = dx.astype(dx_ref.dtype)
    dy_ref[0] = dy.astype(dy_ref.dtype)
    # weight/bias grads accumulate across the (sequential) grid;
    # layouts [H, dh, D] / [H, dh, 1], transposed outside
    dwq_ref[...] += _bdot(dq, x, 1, 0, batch=False, dt=dt)
    dwk_ref[...] += _bdot(dk, y, 1, 0, batch=False, dt=dt)
    dwv_ref[...] += _bdot(dv, y, 2, 0, batch=False, dt=dt)
    dbq_ref[...] += jnp.sum(dq, axis=1)[:, :, None]
    dbk_ref[...] += jnp.sum(dk, axis=1)[:, :, None]
    dbv_ref[...] += jnp.sum(dv, axis=2)[:, :, None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def _fused_attn(x, y, wq3, bq3, wk3, bk3, wv3, bv3, bias4, seed,
                drop, interpret):
    """x [B,Lq,D], y [B,Lk,D], w*3 [H,D,dh], b*3 [H,1,dh],
    bias4 [B,Hb,Lq,Lk], seed [B,1] i32 -> out [B,H,Lq,dh]."""
    return _fa_call(x, y, wq3, bq3, wk3, bk3, wv3, bv3, bias4, seed,
                    drop, interpret)


def _fa_call(x, y, wq3, bq3, wk3, bk3, wv3, bv3, bias4, seed,
             drop, interpret):
    B, Lq, D = x.shape
    Lk = y.shape[1]
    H, _, dh = wq3.shape
    Hb = bias4.shape[1]
    scale = 1.0 / math.sqrt(dh)
    kern = functools.partial(_fa_fwd_kernel, H=H, Hb=Hb, scale=scale,
                             drop=drop)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Lq, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Lk, D), lambda i: (i, 0, 0)),
            pl.BlockSpec(wq3.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(bq3.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(wk3.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(bk3.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(wv3.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(bv3.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec((1, Hb, Lq, Lk), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=(pltpu.SMEM if pltpu is not None
                                       else None)),
        ],
        out_specs=pl.BlockSpec((1, H, Lq, dh), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, dh), x.dtype),
        interpret=interpret,
    )(x, y, wq3, bq3, wk3, bk3, wv3, bv3, bias4, seed)


def _fa_fwd_rule(x, y, wq3, bq3, wk3, bk3, wv3, bv3, bias4, seed,
                 drop, interpret):
    out = _fa_call(x, y, wq3, bq3, wk3, bk3, wv3, bv3, bias4, seed,
                   drop, interpret)
    return out, (x, y, wq3, bq3, wk3, bk3, wv3, bv3, bias4, seed)


def _fa_bwd_rule(drop, interpret, res, do):
    x, y, wq3, bq3, wk3, bk3, wv3, bv3, bias4, seed = res
    B, Lq, D = x.shape
    Lk = y.shape[1]
    H, _, dh = wq3.shape
    Hb = bias4.shape[1]
    scale = 1.0 / math.sqrt(dh)
    kern = functools.partial(_fa_bwd_kernel, H=H, Hb=Hb, scale=scale,
                             drop=drop)
    const = lambda i: (0, 0, 0)
    in_specs = [
        pl.BlockSpec((1, Lq, D), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, Lk, D), lambda i: (i, 0, 0)),
        pl.BlockSpec(wq3.shape, lambda i: (0, 0, 0)),
        pl.BlockSpec(bq3.shape, lambda i: (0, 0, 0)),
        pl.BlockSpec(wk3.shape, lambda i: (0, 0, 0)),
        pl.BlockSpec(bk3.shape, lambda i: (0, 0, 0)),
        pl.BlockSpec(wv3.shape, lambda i: (0, 0, 0)),
        pl.BlockSpec(bv3.shape, lambda i: (0, 0, 0)),
        pl.BlockSpec((1, Hb, Lq, Lk), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec(memory_space=(pltpu.SMEM if pltpu is not None
                                   else None)),
        pl.BlockSpec((1, H, Lq, dh), lambda i: (i, 0, 0, 0)),
    ]
    wT = (H, dh, D)          # kernel accumulates wgrads head-major
    out_specs=[
            pl.BlockSpec((1, Lq, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Lk, D), lambda i: (i, 0, 0)),
            pl.BlockSpec(wT, const),   # accumulated across grid
            pl.BlockSpec(bq3.shape, const),
            pl.BlockSpec(wT, const),
            pl.BlockSpec(bk3.shape, const),
            pl.BlockSpec(wT, const),
            pl.BlockSpec(bv3.shape, const),
            pl.BlockSpec((1, Hb, Lq, Lk), lambda i: (i, 0, 0, 0)),
        ]
    outs = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(y.shape, y.dtype),
            jax.ShapeDtypeStruct(wT, jnp.float32),
            jax.ShapeDtypeStruct(bq3.shape, jnp.float32),
            jax.ShapeDtypeStruct(wT, jnp.float32),
            jax.ShapeDtypeStruct(bk3.shape, jnp.float32),
            jax.ShapeDtypeStruct(wT, jnp.float32),
            jax.ShapeDtypeStruct(bv3.shape, jnp.float32),
            jax.ShapeDtypeStruct(bias4.shape, jnp.float32),
        ],
        interpret=interpret,
    )(x, y, wq3, bq3, wk3, bk3, wv3, bv3, bias4, seed, do)
    dx, dy, dwq, dbq, dwk, dbk, dwv, dbv, dbias = outs
    import numpy as _np
    dseed = _np.zeros(seed.shape, jax.dtypes.float0)
    t = lambda w: w.transpose(0, 2, 1)   # [H, dh, D] -> [H, D, dh]
    return (dx, dy, t(dwq).astype(wq3.dtype), dbq.astype(bq3.dtype),
            t(dwk).astype(wk3.dtype), dbk.astype(bk3.dtype),
            t(dwv).astype(wv3.dtype), dbv.astype(bv3.dtype),
            dbias.astype(bias4.dtype), dseed)


_fused_attn.defvjp(_fa_fwd_rule, _fa_bwd_rule)


def pallas_fused_qkv_mha(x, y, wq, bq, wk, bk, wv, bv, bias=None,
                         num_heads: int = 12, dropout_rate: float = 0.0,
                         seed=None, interpret=None):
    """x [B, Lq, D] (query side), y [B, Lk, D] (key/value side), projection
    weights [D, H*dh] (+ biases [H*dh]), additive mask broadcastable to
    [B, {1,H}, {1,Lq}, Lk] -> [B, Lq, H*dh].

    Differentiable (custom-VJP backward kernel).  dropout_rate > 0 applies
    attention-prob dropout INSIDE the kernel (same mask in fwd/bwd; TPU
    PRNG — only available on real TPU, pass 0 under interpret). `seed`:
    int32 [B] per-row seeds (required when dropout_rate > 0)."""
    if interpret is None:
        interpret = _default_interpret()
    B, Lq, D = x.shape
    Lk = y.shape[1]
    H = num_heads
    dh = wq.shape[1] // H

    def heads_w(w):
        return w.reshape(D, H, dh).transpose(1, 0, 2)

    def heads_b(b):
        return b.reshape(H, dh)[:, :, None]          # [H, dh, 1]

    if bias is None:
        bias4 = jnp.zeros((B, 1, Lq, Lk), x.dtype)
    else:
        Hb = H if (bias.ndim == 4 and bias.shape[1] == H) else 1
        bias4 = jnp.broadcast_to(bias, (B, Hb, Lq, Lk)).astype(x.dtype)
    if seed is None:
        seed = jnp.zeros((B,), jnp.int32)
    out4 = _fused_attn(x, y, heads_w(wq), heads_b(bq), heads_w(wk),
                       heads_b(bk), heads_w(wv), heads_b(bv), bias4,
                       seed.astype(jnp.int32),
                       float(dropout_rate), bool(interpret))
    return out4.transpose(0, 2, 1, 3).reshape(B, Lq, H * dh)


# ---------------------------------------------------------------------------
# Fused ATTENTION SUBLAYER: q/k/v + scores + softmax(+drop) + context +
# output projection + (hidden dropout) + residual + LayerNorm, one kernel
# per batch row, fwd + custom-VJP bwd.  This is the whole
# BertAttention(AttentionCore + BertSelfOutput) of models/layers.py —
# fusing the post-attention elementwise tail (bias/dropout/residual/LN)
# that the profile showed dominating the step (VPU passes ~3x MXU time).


def _fab_fwd_common(x, y, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                    bias_ref, seed_ref, wo_ref, bo_ref, g_ref, b2_ref,
                    *, Hb, scale, drop, hdrop, eps):
    """Shared forward math -> (p, pd, keep, ctx, keep2, r, mu, inv_sigma,
    out).  Seeds the PRNG once when any dropout is active."""
    if drop > 0.0 or hdrop > 0.0:
        pltpu.prng_seed(seed_ref[pl.program_id(0)])
    dt = x.dtype
    q, k, v = _fa_qkv(x, y, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref)
    p, pd, keep = _fa_probs(q, k, bias_ref, seed_ref, Hb=Hb, scale=scale,
                            drop=drop, seed_inside=False, dt=dt)
    ctx = _bdot(pd, v, 2, 2, dt=dt)                   # [H, Lq, dh]
    # out-proj as a batched per-head dot summed over heads (Mosaic only
    # supports a single contracting dim per matmul; the [H, Lq, D]
    # intermediate fits under the raised VMEM cap): wo [H, dh, D]
    h = jnp.sum(_bdot(ctx, wo_ref[...], 2, 1, dt=dt), axis=0)  # [Lq, D]
    h = h + bo_ref[...].astype(jnp.float32)             # [1, D]
    keep2 = None
    if hdrop > 0.0:
        keep2 = _keep_mask(h.shape, hdrop)
        h = jnp.where(keep2, h * (1.0 / (1.0 - hdrop)), 0.0)
    r = h + x.astype(jnp.float32)
    mu = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean((r - mu) ** 2, axis=-1, keepdims=True)
    inv_sigma = jax.lax.rsqrt(var + eps)
    xhat = (r - mu) * inv_sigma
    out = xhat * g_ref[...].astype(jnp.float32) + b2_ref[...].astype(
        jnp.float32)
    return q, k, v, p, pd, keep, ctx, keep2, r, mu, inv_sigma, xhat, out


def _fab_fwd_kernel(x_ref, y_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                    wv_ref, bv_ref, bias_ref, seed_ref, wo_ref, bo_ref,
                    g_ref, b2_ref, o_ref, *, Hb, scale, drop, hdrop, eps):
    x = x_ref[0]
    y = y_ref[0]
    *_, out = _fab_fwd_common(
        x, y, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, bias_ref,
        seed_ref, wo_ref, bo_ref, g_ref, b2_ref, Hb=Hb, scale=scale,
        drop=drop, hdrop=hdrop, eps=eps)
    o_ref[0] = out.astype(o_ref.dtype)


def _fab_bwd_kernel(x_ref, y_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                    wv_ref, bv_ref, bias_ref, seed_ref, wo_ref, bo_ref,
                    g_ref, b2_ref, do_ref,
                    dx_ref, dy_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref,
                    dwv_ref, dbv_ref, dbias_ref, dwo_ref, dbo_ref,
                    dg_ref, db2_ref,
                    *, Hb, scale, drop, hdrop, eps):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        for r in (dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
                  dwo_ref, dbo_ref, dg_ref, db2_ref):
            r[...] = jnp.zeros_like(r)

    x = x_ref[0]
    y = y_ref[0]
    q, k, v, p, pd, keep, ctx, keep2, r, mu, inv_sigma, xhat, _ = \
        _fab_fwd_common(
            x, y, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, bias_ref,
            seed_ref, wo_ref, bo_ref, g_ref, b2_ref, Hb=Hb, scale=scale,
            drop=drop, hdrop=hdrop, eps=eps)

    dY = do_ref[0].astype(jnp.float32)                 # [Lq, D]
    # LayerNorm backward
    dg_ref[...] += jnp.sum(dY * xhat, axis=0)[None, :]
    db2_ref[...] += jnp.sum(dY, axis=0)[None, :]
    dxhat = dY * g_ref[...].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dr = inv_sigma * (dxhat - m1 - xhat * m2)          # [Lq, D]

    # hidden dropout + out-proj backward
    dt = x.dtype
    dh = jnp.where(keep2, dr * (1.0 / (1.0 - hdrop)), 0.0) \
        if keep2 is not None else dr
    dbo_ref[...] += jnp.sum(dh, axis=0)[None, :]
    dwo_ref[...] += _bdot(ctx, dh, 1, 0, batch=False, dt=dt)  # [H, dh, D]
    # dctx kept in [H, dh, Lq] orientation (wo [H, dh, D] x dh [Lq, D]
    # contracting D) — every downstream dot is then a leading-batch,
    # single-contraction matmul, the only form Mosaic's tpu.matmul
    # implements (no lane/sublane transposes anywhere)
    dctxT = _bdot(wo_ref[...], dh, 2, 1, batch=False, dt=dt)  # [H, dh, Lq]

    # attention backward (mirror of _fa_bwd_kernel, reading dctxT)
    inv_keep = 1.0 / (1.0 - drop) if drop > 0.0 else 1.0
    # dv[h, i, k] = sum_q dctxT[h, i, q] * pd[h, q, k]
    dv = _bdot(dctxT, pd, 2, 1, dt=dt)                  # [H, dh, Lk]
    # dpd[h, q, k] = sum_i dctxT[h, i, q] * v[h, i, k]
    dpd = _bdot(dctxT, v, 1, 1, dt=dt)                  # [H, Lq, Lk]
    dp = jnp.where(keep, dpd * inv_keep, 0.0) if keep is not None else dpd
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    if Hb > 1:
        dbias_ref[0] = ds.astype(dbias_ref.dtype)
    else:
        dbias_ref[0] = jnp.sum(ds, axis=0,
                               keepdims=True).astype(dbias_ref.dtype)
    dss = ds * scale
    dq = _bdot(dss, k, 2, 2, dt=dt)                     # [H, Lq, dh]
    dk = _bdot(dss, q, 1, 2, dt=dt)                     # [H, Lk, dh]
    dx = jnp.sum(_bdot(dq, wq_ref[...], 2, 2, dt=dt), axis=0)  # [Lq, D]
    dy = jnp.sum(_bdot(dk, wk_ref[...], 2, 2, dt=dt), axis=0) \
        + jnp.sum(_bdot(dv, wv_ref[...], 1, 2, dt=dt), axis=0)
    dx = dx + dr                                        # residual path
    dx_ref[0] = dx.astype(dx_ref.dtype)
    dy_ref[0] = dy.astype(dy_ref.dtype)
    dwq_ref[...] += _bdot(dq, x, 1, 0, batch=False, dt=dt)
    dwk_ref[...] += _bdot(dk, y, 1, 0, batch=False, dt=dt)
    dwv_ref[...] += _bdot(dv, y, 2, 0, batch=False, dt=dt)
    dbq_ref[...] += jnp.sum(dq, axis=1)[:, :, None]
    dbk_ref[...] += jnp.sum(dk, axis=1)[:, :, None]
    dbv_ref[...] += jnp.sum(dv, axis=2)[:, :, None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17))
def _fused_attn_block(x, y, wq3, bq3, wk3, bk3, wv3, bv3, bias4, seed,
                      wo3, bo2, g2, b2, drop, hdrop, eps, interpret):
    return _fab_call(x, y, wq3, bq3, wk3, bk3, wv3, bv3, bias4, seed,
                     wo3, bo2, g2, b2, drop, hdrop, eps, interpret)


def _fab_specs(x, y, wq3, bq3, bias4, wo3):
    B, Lq, D = x.shape
    Lk = y.shape[1]
    Hb = bias4.shape[1]
    const3 = lambda i: (0, 0, 0)
    const2 = lambda i: (0, 0)
    return [
        pl.BlockSpec((1, Lq, D), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, Lk, D), lambda i: (i, 0, 0)),
        pl.BlockSpec(wq3.shape, const3),
        pl.BlockSpec(bq3.shape, const3),
        pl.BlockSpec(wq3.shape, const3),
        pl.BlockSpec(bq3.shape, const3),
        pl.BlockSpec(wq3.shape, const3),
        pl.BlockSpec(bq3.shape, const3),
        pl.BlockSpec((1, Hb, Lq, Lk), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec(memory_space=(pltpu.SMEM if pltpu is not None
                                   else None)),
        pl.BlockSpec(wo3.shape, const3),
        pl.BlockSpec((1, x.shape[2]), const2),
        pl.BlockSpec((1, x.shape[2]), const2),
        pl.BlockSpec((1, x.shape[2]), const2),
    ]


def _fab_call(x, y, wq3, bq3, wk3, bk3, wv3, bv3, bias4, seed,
              wo3, bo2, g2, b2, drop, hdrop, eps, interpret):
    B, Lq, D = x.shape
    H, _, dh = wq3.shape
    Hb = bias4.shape[1]
    kern = functools.partial(_fab_fwd_kernel, Hb=Hb,
                             scale=1.0 / math.sqrt(dh), drop=drop,
                             hdrop=hdrop, eps=eps)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=_fab_specs(x, y, wq3, bq3, bias4, wo3),
        out_specs=pl.BlockSpec((1, Lq, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Lq, D), x.dtype),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(x, y, wq3, bq3, wk3, bk3, wv3, bv3, bias4, seed, wo3, bo2, g2, b2)


def _vmem_params():
    """Raise the Mosaic scoped-VMEM cap: the block kernels keep all four
    projection weights resident, which busts the 16M default at D=768."""
    if pltpu is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _fab_fwd_rule(x, y, wq3, bq3, wk3, bk3, wv3, bv3, bias4, seed,
                  wo3, bo2, g2, b2, drop, hdrop, eps, interpret):
    out = _fab_call(x, y, wq3, bq3, wk3, bk3, wv3, bv3, bias4, seed,
                    wo3, bo2, g2, b2, drop, hdrop, eps, interpret)
    return out, (x, y, wq3, bq3, wk3, bk3, wv3, bv3, bias4, seed,
                 wo3, bo2, g2, b2)


def _fab_bwd_rule(drop, hdrop, eps, interpret, res, do):
    (x, y, wq3, bq3, wk3, bk3, wv3, bv3, bias4, seed,
     wo3, bo2, g2, b2) = res
    B, Lq, D = x.shape
    H, _, dh = wq3.shape
    Hb = bias4.shape[1]
    kern = functools.partial(_fab_bwd_kernel, Hb=Hb,
                             scale=1.0 / math.sqrt(dh), drop=drop,
                             hdrop=hdrop, eps=eps)
    const3 = lambda i: (0, 0, 0)
    const2 = lambda i: (0, 0)
    wT = (H, dh, D)
    in_specs = _fab_specs(x, y, wq3, bq3, bias4, wo3) + [
        pl.BlockSpec((1, Lq, D), lambda i: (i, 0, 0)),
    ]
    out_specs = [
        pl.BlockSpec((1, Lq, D), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, y.shape[1], D), lambda i: (i, 0, 0)),
        pl.BlockSpec(wT, const3),
        pl.BlockSpec(bq3.shape, const3),
        pl.BlockSpec(wT, const3),
        pl.BlockSpec(bq3.shape, const3),
        pl.BlockSpec(wT, const3),
        pl.BlockSpec(bq3.shape, const3),
        pl.BlockSpec((1, Hb, Lq, y.shape[1]), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec(wo3.shape, const3),
        pl.BlockSpec((1, D), const2),
        pl.BlockSpec((1, D), const2),
        pl.BlockSpec((1, D), const2),
    ]
    outs = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(y.shape, y.dtype),
            jax.ShapeDtypeStruct(wT, jnp.float32),
            jax.ShapeDtypeStruct(bq3.shape, jnp.float32),
            jax.ShapeDtypeStruct(wT, jnp.float32),
            jax.ShapeDtypeStruct(bq3.shape, jnp.float32),
            jax.ShapeDtypeStruct(wT, jnp.float32),
            jax.ShapeDtypeStruct(bq3.shape, jnp.float32),
            jax.ShapeDtypeStruct(bias4.shape, jnp.float32),
            jax.ShapeDtypeStruct(wo3.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(x, y, wq3, bq3, wk3, bk3, wv3, bv3, bias4, seed, wo3, bo2, g2, b2, do)
    (dx, dy, dwq, dbq, dwk, dbk, dwv, dbv, dbias, dwo, dbo, dg, db2) = outs
    import numpy as _np
    dseed = _np.zeros(seed.shape, jax.dtypes.float0)
    t = lambda w: w.transpose(0, 2, 1)
    return (dx, dy, t(dwq).astype(wq3.dtype), dbq.astype(bq3.dtype),
            t(dwk).astype(wk3.dtype), dbk.astype(bk3.dtype),
            t(dwv).astype(wv3.dtype), dbv.astype(bv3.dtype),
            dbias.astype(bias4.dtype), dseed, dwo.astype(wo3.dtype),
            dbo.astype(bo2.dtype), dg.astype(g2.dtype), db2.astype(b2.dtype))


_fused_attn_block.defvjp(_fab_fwd_rule, _fab_bwd_rule)


def pallas_fused_attn_block(x, y, wq, bq, wk, bk, wv, bv, wo, bo,
                            gamma, beta, bias=None, num_heads: int = 12,
                            attn_dropout: float = 0.0,
                            hidden_dropout: float = 0.0,
                            ln_eps: float = 1e-12, seed=None,
                            interpret=None):
    """Whole attention sublayer: LayerNorm(x + Drop(Dense(MHA(x, y)))).

    x [B, Lq, D] (query side + residual), y [B, Lk, D] (key/value side),
    projection weights [D, H*dh] (+ biases), out-proj wo [D, D] + bo [D],
    LayerNorm gamma/beta [D], additive mask broadcastable to
    [B, {1,H}, {1,Lq}, Lk] -> [B, Lq, D].  Mirrors
    models/layers.BertAttention (AttentionCore + BertSelfOutput) with
    reference numerics (f32 softmax and LN, eps ln_eps)."""
    if interpret is None:
        interpret = _default_interpret()
    B, Lq, D = x.shape
    Lk = y.shape[1]
    H = num_heads
    dh = wq.shape[1] // H

    def heads_w(w):
        return w.reshape(D, H, dh).transpose(1, 0, 2)

    def heads_b(b):
        return b.reshape(H, dh)[:, :, None]

    if bias is None:
        bias4 = jnp.zeros((B, 1, Lq, Lk), x.dtype)
    else:
        Hb = H if (bias.ndim == 4 and bias.shape[1] == H) else 1
        bias4 = jnp.broadcast_to(bias, (B, Hb, Lq, Lk)).astype(x.dtype)
    if seed is None:
        seed = jnp.zeros((B,), jnp.int32)
    wo3 = wo.reshape(H, dh, D)

    # Row-blocking: fold rb examples into one grid block so the q/k/v and
    # out projections run on [rb*Lq, 768]-row matmuls instead of ~50-row
    # ones (the round-2 per-example grid starved the MXU).  Attention
    # between different examples is forbidden by a block-diagonal bias
    # (-1e9 off-diagonal -> exactly-0 probs after the f32 softmax); the
    # score/context matmuls do rb x redundant masked work — cheap next to
    # the projection win.  Numerics otherwise identical (dropout draws
    # move between rows).  GOAT_PALLAS_ATTN_RB tunes; rb=4 keeps the
    # [H, rb*Lq, rb*Lk] f32 score tensors well under the VMEM cap.
    rb = math.gcd(B, int(os.environ.get("GOAT_PALLAS_ATTN_RB", "4")))
    if rb > 1:
        Bg = B // rb
        NEG = jnp.asarray(-1e9, bias4.dtype)
        t = bias4.reshape(Bg, rb, Hb, Lq, Lk)[:, :, None]
        eye = jnp.eye(rb, dtype=bool)[None, :, :, None, None, None]
        bias4 = jnp.where(eye, t, NEG).transpose(0, 3, 1, 4, 2, 5) \
            .reshape(Bg, Hb, rb * Lq, rb * Lk)
        x = x.reshape(Bg, rb * Lq, D)
        y = y.reshape(Bg, rb * Lk, D)
        seed = seed[::rb]
    out = _fused_attn_block(
        x, y, heads_w(wq), heads_b(bq), heads_w(wk), heads_b(bk),
        heads_w(wv), heads_b(bv), bias4, seed.astype(jnp.int32),
        wo3, bo.reshape(1, D), gamma.reshape(1, D), beta.reshape(1, D),
        float(attn_dropout), float(hidden_dropout), float(ln_eps),
        bool(interpret))
    return out.reshape(B, Lq, D)


# ---------------------------------------------------------------------------
# Fused FFN SUBLAYER: dense(D->F) + erf-gelu + dense(F->D) + dropout +
# residual + LayerNorm, one kernel per batch row, fwd + custom-VJP bwd —
# the symmetric other half of the fused attention sublayer
# (BertIntermediate + BertOutput of models/layers.py).

_SQRT2 = math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _erf(x):
    """erf for Mosaic (no erf primitive in the Pallas TPU lowering):
    Abramowitz & Stegun 7.1.26 rational approximation, |err| <= 1.5e-7 —
    far below the bf16 activation resolution and the fp32 parity
    tolerances.  The backward uses the hand-written analytic gelu
    gradient, so the approximation error does not compound."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_erf(x):
    return 0.5 * x * (1.0 + _erf(x / _SQRT2))


def _gelu_erf_grad(x):
    return 0.5 * (1.0 + _erf(x / _SQRT2)) \
        + x * _INV_SQRT_2PI * jnp.exp(-0.5 * x * x)


def _ffb_fwd_common(x, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, b3_ref,
                    seed_ref, *, hdrop, eps):
    if hdrop > 0.0:
        pltpu.prng_seed(seed_ref[pl.program_id(0)])
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    pre = _bdot(x, w1_ref[...], 1, 0, batch=False, dt=dt) \
        + b1_ref[...].astype(jnp.float32)               # [L, F]
    a = _gelu_erf(pre)
    h = _bdot(a, w2_ref[...], 1, 0, batch=False, dt=dt) \
        + b2_ref[...].astype(jnp.float32)               # [L, D]
    keep = None
    if hdrop > 0.0:
        keep = _keep_mask(h.shape, hdrop)
        h = jnp.where(keep, h * (1.0 / (1.0 - hdrop)), 0.0)
    r = h + x32
    mu = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean((r - mu) ** 2, axis=-1, keepdims=True)
    inv_sigma = jax.lax.rsqrt(var + eps)
    xhat = (r - mu) * inv_sigma
    out = xhat * g_ref[...].astype(jnp.float32) \
        + b3_ref[...].astype(jnp.float32)
    return pre, a, keep, r, mu, inv_sigma, xhat, out


def _ffb_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, b3_ref,
                    seed_ref, o_ref, *, hdrop, eps):
    *_, out = _ffb_fwd_common(x_ref[0], w1_ref, b1_ref, w2_ref, b2_ref,
                              g_ref, b3_ref, seed_ref, hdrop=hdrop, eps=eps)
    o_ref[0] = out.astype(o_ref.dtype)


def _ffb_bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, b3_ref,
                    seed_ref, do_ref,
                    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref,
                    db3_ref, *, hdrop, eps):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        for r in (dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref, db3_ref):
            r[...] = jnp.zeros_like(r)

    x = x_ref[0]
    pre, a, keep, r, mu, inv_sigma, xhat, _ = _ffb_fwd_common(
        x, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, b3_ref, seed_ref,
        hdrop=hdrop, eps=eps)
    dY = do_ref[0].astype(jnp.float32)
    dg_ref[...] += jnp.sum(dY * xhat, axis=0)[None, :]
    db3_ref[...] += jnp.sum(dY, axis=0)[None, :]
    dxhat = dY * g_ref[...].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dr = inv_sigma * (dxhat - m1 - xhat * m2)
    dt = x.dtype
    dh = jnp.where(keep, dr * (1.0 / (1.0 - hdrop)), 0.0) \
        if keep is not None else dr
    db2_ref[...] += jnp.sum(dh, axis=0)[None, :]
    dw2_ref[...] += _bdot(a, dh, 0, 0, batch=False, dt=dt)   # [F, D]
    da = _bdot(dh, w2_ref[...], 1, 1, batch=False, dt=dt)    # [L, F]
    dpre = da * _gelu_erf_grad(pre)
    db1_ref[...] += jnp.sum(dpre, axis=0)[None, :]
    dw1_ref[...] += _bdot(x, dpre, 0, 0, batch=False, dt=dt)
    dx = _bdot(dpre, w1_ref[...], 1, 1, batch=False, dt=dt) + dr
    dx_ref[0] = dx.astype(dx_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _fused_ffn_block(x, w1, b1, w2, b2, g2, b3, seed, hdrop, eps,
                     interpret):
    return _ffb_call(x, w1, b1, w2, b2, g2, b3, seed, hdrop, eps, interpret)


def _ffb_in_specs(x, w1, w2):
    const2 = lambda i: (0, 0)
    return [
        pl.BlockSpec((1,) + x.shape[1:], lambda i: (i, 0, 0)),
        pl.BlockSpec(w1.shape, const2),
        pl.BlockSpec((1, w1.shape[1]), const2),
        pl.BlockSpec(w2.shape, const2),
        pl.BlockSpec((1, w2.shape[1]), const2),
        pl.BlockSpec((1, w2.shape[1]), const2),
        pl.BlockSpec((1, w2.shape[1]), const2),
        pl.BlockSpec(memory_space=(pltpu.SMEM if pltpu is not None
                                   else None)),
    ]


def _ffb_call(x, w1, b1, w2, b2, g2, b3, seed, hdrop, eps, interpret):
    B, L, D = x.shape
    kern = functools.partial(_ffb_fwd_kernel, hdrop=hdrop, eps=eps)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=_ffb_in_specs(x, w1, w2),
        out_specs=pl.BlockSpec((1, L, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, D), x.dtype),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(x, w1, b1, w2, b2, g2, b3, seed)


def _ffb_fwd_rule(x, w1, b1, w2, b2, g2, b3, seed, hdrop, eps, interpret):
    out = _ffb_call(x, w1, b1, w2, b2, g2, b3, seed, hdrop, eps, interpret)
    return out, (x, w1, b1, w2, b2, g2, b3, seed)


def _ffb_bwd_rule(hdrop, eps, interpret, res, do):
    x, w1, b1, w2, b2, g2, b3, seed = res
    B, L, D = x.shape
    F = w1.shape[1]
    kern = functools.partial(_ffb_bwd_kernel, hdrop=hdrop, eps=eps)
    const2 = lambda i: (0, 0)
    outs = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=_ffb_in_specs(x, w1, w2) + [
            pl.BlockSpec((1, L, D), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, L, D), lambda i: (i, 0, 0)),
            pl.BlockSpec(w1.shape, const2),
            pl.BlockSpec((1, F), const2),
            pl.BlockSpec(w2.shape, const2),
            pl.BlockSpec((1, D), const2),
            pl.BlockSpec((1, D), const2),
            pl.BlockSpec((1, D), const2),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(w1.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(x, w1, b1, w2, b2, g2, b3, seed, do)
    dx, dw1, db1, dw2, db2, dg, db3 = outs
    import numpy as _np
    dseed = _np.zeros(seed.shape, jax.dtypes.float0)
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype), dg.astype(g2.dtype),
            db3.astype(b3.dtype), dseed)


_fused_ffn_block.defvjp(_ffb_fwd_rule, _ffb_bwd_rule)


def pallas_fused_ffn_block(x, w1, b1, w2, b2, gamma, beta,
                           hidden_dropout: float = 0.0,
                           ln_eps: float = 1e-12, seed=None,
                           interpret=None):
    """Whole FFN sublayer: LayerNorm(x + Drop(Dense(gelu(Dense(x))))).

    x [B, L, D]; w1 [D, F], w2 [F, D]; erf-gelu (reference
    Bert_backbone.py:40-46); reference numerics (f32 internals, LN eps).

    Row-blocking: the FFN math is purely row-wise (matmuls over rows,
    per-row LN, per-element gelu/dropout, weight grads summed over rows),
    so RB examples are folded into one grid block via a pure reshape
    [B, L, D] -> [B/rb, rb*L, D].  The original per-example grid ran
    [~50, 768]x[768, 3072] matmuls — far too few rows for the MXU (the
    round-2 A/B loss); rb=8 gives ~400-row matmuls with identical
    numerics (dropout draws move between rows: same Bernoulli
    distributions, documented divergence).  GOAT_PALLAS_FFN_RB tunes."""
    if interpret is None:
        interpret = _default_interpret()
    B, L, D = x.shape
    if seed is None:
        seed = jnp.zeros((B,), jnp.int32)
    rb = math.gcd(B, int(os.environ.get("GOAT_PALLAS_FFN_RB", "8")))
    x2 = x.reshape(B // rb, rb * L, D)
    out = _fused_ffn_block(
        x2, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
        gamma.reshape(1, -1), beta.reshape(1, -1),
        seed[::rb].astype(jnp.int32),
        float(hidden_dropout), float(ln_eps), bool(interpret))
    return out.reshape(B, L, D)
