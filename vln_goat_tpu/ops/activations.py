"""Activations.

The reference uses the exact erf-based GELU (map_nav_src/models/Bert_backbone.py:40-46),
not the tanh approximation; checkpoint parity requires matching it.
"""
import jax
import jax.numpy as jnp


def gelu_erf(x):
    return jax.nn.gelu(x, approximate=False)


def swish(x):
    return x * jax.nn.sigmoid(x)


ACT2FN = {
    "gelu": gelu_erf,
    "relu": jax.nn.relu,
    "swish": swish,
    "tanh": jnp.tanh,
}
