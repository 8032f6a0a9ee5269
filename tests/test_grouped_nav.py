"""Grouped dual-branch nav encoder parity: forward_navigation with
GOAT_GROUPED_NAV=1 (stacked-weight single computation over both branches,
layers.grouped_dual_cross_encoder) must match the two separate
CrossmodalEncoder calls exactly when deterministic — same matmuls, batched.

Reference semantics preserved: vilmodel_GOAT.py:739-839 global+local
branches with graph_sprels self-bias on the global side only."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vln_goat_tpu.config import GoatConfig
from vln_goat_tpu.models.goat import GoatModel
from vln_goat_tpu.rollout.env import EpisodeBatcher, make_synthetic_dataset
from vln_goat_tpu.rollout.rollout import NavRollout, RolloutConfig
from vln_goat_tpu.rollout.world import NavWorld
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
from vln_goat_tpu.train.params import init_goat_params

# multi-10s full-scale runs: slow tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def setup():
    cfg = GoatConfig(num_l_layers=2, num_x_layers=2, num_pano_layers=1,
                     hidden_size=64, num_attention_heads=4,
                     intermediate_size=128, vocab_size=64,
                     max_position_embeddings=64, image_feat_size=16,
                     hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
                     feat_dropout=0.0)
    rcfg = RolloutConfig(num_nodes=12, horizon=5, feat_dim=16)
    scans = [make_synthetic_scan("s0", num_vps=12, seed=0)]
    world = NavWorld.build(scans, feat_dim=16, seed=0)
    model = GoatModel(cfg)
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                              num_nodes=rcfg.num_nodes)
    ro = NavRollout(model, world, rcfg)
    graphs = {g.scan_id: g for g in scans}
    data = make_synthetic_dataset(graphs, 12, vocab_size=cfg.vocab_size,
                                  path_len=(3, 5), seed=1)
    batcher = EpisodeBatcher(data, graphs, ["s0"], batch_size=4,
                             max_instr_len=24, max_gt_len=6)
    return dict(ro=ro, params=params, batcher=batcher)


def _run(ro, params, batch, grouped: bool):
    os.environ["GOAT_GROUPED_NAV"] = "1" if grouped else "0"
    try:
        fn = jax.jit(ro.build_rollout("teacher", train_ml=True,
                                      deterministic=True))
        return fn(params, batch, jax.random.PRNGKey(3))
    finally:
        os.environ.pop("GOAT_GROUPED_NAV", None)


def test_grouped_nav_rollout_parity(setup):
    """Whole teacher rollout (logits -> CE loss, MEM-token feedback across
    steps) identical with and without the grouped encoder."""
    ro, params, batcher = setup["ro"], setup["params"], setup["batcher"]
    _, batch = batcher.next_batch()
    out_u = _run(ro, params, batch, grouped=False)
    out_g = _run(ro, params, batch, grouped=True)
    np.testing.assert_array_equal(np.asarray(out_g["targets"]),
                                  np.asarray(out_u["targets"]))
    np.testing.assert_allclose(float(out_g["ml_loss"]),
                               float(out_u["ml_loss"]), rtol=5e-6)
    np.testing.assert_allclose(np.asarray(out_g["loss_per_ep"]),
                               np.asarray(out_u["loss_per_ep"]), rtol=5e-6)


def test_grouped_nav_grads_match(setup):
    ro, params, batcher = setup["ro"], setup["params"], setup["batcher"]
    _, batch = batcher.next_batch()
    rng = jax.random.PRNGKey(5)

    def grad_of(grouped):
        os.environ["GOAT_GROUPED_NAV"] = "1" if grouped else "0"
        try:
            fn = ro.build_rollout("teacher", train_ml=True,
                                  deterministic=True)
            return jax.jit(jax.grad(
                lambda p: fn(p, batch, rng)["ml_loss"]))(params)
        finally:
            os.environ.pop("GOAT_GROUPED_NAV", None)

    g_u = grad_of(False)
    g_g = grad_of(True)
    flat_u = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_u)}
    for k, v in jax.tree_util.tree_leaves_with_path(g_g):
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat_u[ks]),
                                   rtol=2e-5, atol=2e-6, err_msg=ks)


def test_grouped_nav_dropout_runs(setup):
    """Under dropout the grouped path draws different masks (documented
    divergence) but must produce a finite loss and consume rngs cleanly."""
    ro, params, batcher = setup["ro"], setup["params"], setup["batcher"]
    _, batch = batcher.next_batch()
    os.environ["GOAT_GROUPED_NAV"] = "1"
    try:
        fn = jax.jit(ro.build_rollout("teacher", train_ml=True,
                                      deterministic=False))
        out = fn(params, batch, jax.random.PRNGKey(9))
        assert np.isfinite(float(out["ml_loss"]))
    finally:
        os.environ.pop("GOAT_GROUPED_NAV", None)
