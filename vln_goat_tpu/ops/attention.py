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


