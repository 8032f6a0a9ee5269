"""Activations.

The reference uses the exact erf-based GELU (map_nav_src/models/Bert_backbone.py:40-46),
not the tanh approximation; checkpoint parity requires matching it.
"""
import jax
import jax.numpy as jnp


def gelu_erf(x):
    # 0.5*x*(1+erf(x/sqrt(2))) spelled with lax.erf, which stays a NATIVE
    # TPU HLO op.  jax.nn.gelu(approximate=False) lowers through erfc,
    # which XLA:TPU expands into a ~90-op f32 rational approximation
    # (exp + 2 divides) — measured as the single largest VPU cost of the
    # DAgger train step (fused after every FFN matmul in the forward, the
    # remat recompute, AND the VJP).  erfc(-z) == 1 + erf(z) exactly; the
    # two forms differ only in final-ulp rounding.
    dt = jnp.result_type(x.dtype, jnp.float32)
    z = x.astype(dt)
    return (0.5 * z * (1.0 + jax.lax.erf(z * 0.7071067811865476))
            ).astype(x.dtype)


def swish(x):
    return x * jax.nn.sigmoid(x)


ACT2FN = {
    "gelu": gelu_erf,
    "relu": jax.nn.relu,
    "swish": swish,
    "tanh": jnp.tanh,
}
