"""Optimizer-variant registry (pretrain_src/optim rebuild): every variant
optimizes a quadratic; lookahead syncs slow weights every k steps; ralamb
scales by the LARS trust ratio."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from vln_goat_tpu.pretrain.optimizers import (build_optimizer, lookahead,
                                              ralamb, rangerlars)


def _optimize(tx, steps=60):
    params = {"w": jnp.asarray([2.0, -3.0, 1.5]), "b": jnp.asarray(4.0)}
    state = tx.init(params)

    def loss_fn(p):
        return jnp.sum(p["w"] ** 2) + p["b"] ** 2

    l0 = float(loss_fn(params))
    for _ in range(steps):
        g = jax.grad(loss_fn)(params)
        upd, state = tx.update(g, state, params)
        params = optax.apply_updates(params, upd)
    return l0, float(loss_fn(params))


@pytest.mark.parametrize("name", ["adam", "adamax", "adamw", "radam",
                                  "ralamb", "rangerlars"])
def test_variant_optimizes(name):
    tx = build_optimizer(name, 0.1, weight_decay=0.0)
    l0, l1 = _optimize(tx)
    assert l1 < 0.2 * l0, (name, l0, l1)


def test_invalid_name():
    with pytest.raises(ValueError):
        build_optimizer("sgdmagic", 0.1)


def test_lookahead_sync_semantics():
    """Between syncs, lookahead == base; at step k the params are pulled
    to slow + alpha*(fast - slow) (optim/lookahead.py:29-53)."""
    k, alpha = 3, 0.5
    base = optax.sgd(0.1)
    tx = lookahead(base, alpha=alpha, k=k)
    params = {"w": jnp.asarray(1.0)}
    state = tx.init(params)
    bstate = base.init(params)
    bparams = dict(params)
    slow0 = 1.0
    hist = []
    for step in range(1, k + 1):
        g = {"w": jnp.asarray(2.0) * params["w"]}
        upd, state = tx.update(g, state, params)
        params = optax.apply_updates(params, upd)
        gb = {"w": jnp.asarray(2.0) * bparams["w"]}
        ub, bstate = base.update(gb, bstate, bparams)
        bparams = optax.apply_updates(bparams, ub)
        hist.append(float(params["w"]))
        if step < k:
            np.testing.assert_allclose(float(params["w"]),
                                       float(bparams["w"]), rtol=1e-6)
    expected = slow0 + alpha * (float(bparams["w"]) - slow0)
    np.testing.assert_allclose(hist[-1], expected, rtol=1e-6)


def test_ralamb_trust_ratio_direction():
    """Updates shrink when the weight norm is tiny (trust -> small)."""
    tx = ralamb(0.1)
    big = {"w": jnp.full((4,), 5.0)}
    small = {"w": jnp.full((4,), 1e-4)}
    g = {"w": jnp.ones((4,))}
    sb = tx.init(big)
    ss = tx.init(small)
    ub, _ = tx.update(g, sb, big)
    us, _ = tx.update(g, ss, small)
    assert float(jnp.linalg.norm(us["w"])) < \
        float(jnp.linalg.norm(ub["w"]))
