"""Fused-DAgger correctness: the single 2B-episode scan must reproduce the
two separate rollouts it replaces (trainer.py train_alg='dagger_fused';
reference semantics agent_base.py:154-203), and the chunked early-exit
scan must be loss-identical to the plain full-horizon scan."""
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
from vln_goat_tpu.train.trainer import (fuse_dagger_batches,
                                        init_train_state, make_optimizer,
                                        make_train_step)


@pytest.fixture(scope="module")
def tiny():
    cfg = GoatConfig(num_l_layers=1, num_x_layers=1, num_pano_layers=1,
                     hidden_size=32, num_attention_heads=2,
                     intermediate_size=64, vocab_size=64,
                     max_position_embeddings=64, image_feat_size=16,
                     hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                     feat_dropout=0.0)
    rcfg = RolloutConfig(num_nodes=12, horizon=6, feat_dim=16)
    scans = [make_synthetic_scan("s0", num_vps=12, seed=0)]
    world = NavWorld.build(scans, feat_dim=16, seed=0)
    model = GoatModel(cfg)
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                              num_nodes=rcfg.num_nodes)
    ro = NavRollout(model, world, rcfg)
    graphs = {g.scan_id: g for g in scans}
    data = make_synthetic_dataset(graphs, 24, vocab_size=cfg.vocab_size,
                                  path_len=(3, 5), seed=1)
    batcher = EpisodeBatcher(data, graphs, ["s0"], batch_size=4,
                             max_instr_len=24, max_gt_len=7)
    return dict(ro=ro, params=params, batcher=batcher)


def test_fused_halves_match_separate_rollouts(tiny):
    """With a deterministic sample branch (argmax) and no dropout, each
    fused half's per-episode loss equals the separate rollout's loss."""
    ro, params, batcher = tiny["ro"], tiny["params"], tiny["batcher"]
    _, b1 = batcher.next_batch()
    _, b2 = batcher.next_batch()
    rng = jax.random.PRNGKey(3)

    t_fn = jax.jit(ro.build_rollout("teacher", train_ml=True,
                                    deterministic=True))
    a_fn = jax.jit(ro.build_rollout("argmax", train_ml=True,
                                    deterministic=True))
    f_fn = jax.jit(ro.build_rollout("fused_dagger", train_ml=True,
                                    deterministic=True,
                                    sample_feedback="argmax"))

    out_t = t_fn(params, b1, rng)
    out_a = a_fn(params, b2, rng)
    fused = fuse_dagger_batches(b1, b2)
    out_f = f_fn(params, fused, rng)

    B1 = b1["scan_idx"].shape[0]
    lpe = np.asarray(out_f["loss_per_ep"])
    np.testing.assert_allclose(lpe[:B1].sum() / B1,
                               float(out_t["ml_loss"]), rtol=2e-5)
    np.testing.assert_allclose(lpe[B1:].sum() / (len(lpe) - B1),
                               float(out_a["ml_loss"]), rtol=2e-5)
    # actions of each half match the separate runs
    np.testing.assert_array_equal(np.asarray(out_f["actions"])[:, :B1],
                                  np.asarray(out_t["actions"]))
    np.testing.assert_array_equal(np.asarray(out_f["actions"])[:, B1:],
                                  np.asarray(out_a["actions"]))


def test_chunked_exit_matches_full_scan(tiny):
    """exit_chunk early-exit (reference's `if ended.all(): break`,
    agent.py:693-694) changes compute, never values."""
    ro, params, batcher = tiny["ro"], tiny["params"], tiny["batcher"]
    _, b = batcher.next_batch()
    rng = jax.random.PRNGKey(5)
    full = jax.jit(ro.build_rollout("teacher", train_ml=True,
                                    deterministic=True, exit_chunk=0))
    chunked = jax.jit(ro.build_rollout("teacher", train_ml=True,
                                       deterministic=True, exit_chunk=2))
    o1 = full(params, b, rng)
    o2 = chunked(params, b, rng)
    np.testing.assert_allclose(float(o1["ml_loss"]), float(o2["ml_loss"]),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(o1["actions"]),
                                  np.asarray(o2["actions"]))
    np.testing.assert_array_equal(np.asarray(o1["stop_node"]),
                                  np.asarray(o2["stop_node"]))


def test_teacher_horizon_shortening_loss_identical(tiny):
    """Teacher episodes end within max(gt_len) steps, so running the
    teacher scan at that horizon is loss-identical to the full horizon
    (make_train_step teacher_horizon)."""
    import dataclasses

    from vln_goat_tpu.rollout.rollout import NavRollout

    ro, params, batcher = tiny["ro"], tiny["params"], tiny["batcher"]
    _, b = batcher.next_batch()
    rng = jax.random.PRNGKey(9)
    full = jax.jit(ro.build_rollout("teacher", train_ml=True,
                                    deterministic=True))
    short_ro = NavRollout(ro.model, ro.world,
                          dataclasses.replace(ro.rcfg, horizon=5))
    short = jax.jit(short_ro.build_rollout("teacher", train_ml=True,
                                           deterministic=True))
    # gt paths in the fixture have <= 5 nodes -> all episodes stop by t=4
    assert int(np.asarray(b["gt_len"]).max()) <= 5
    o1 = full(params, b, rng)
    o2 = short(params, b, rng)
    np.testing.assert_allclose(float(o1["ml_loss"]), float(o2["ml_loss"]),
                               rtol=1e-6)


def test_train_step_dagger_fused(tiny):
    """One fused train step: finite loss/grad, per-half metrics exposed,
    and gradients actually update the params."""
    ro, params, batcher = tiny["ro"], tiny["params"], tiny["batcher"]
    tx = make_optimizer(lr=1e-4)
    step = jax.jit(make_train_step(ro, tx, train_alg="dagger_fused",
                                   ml_weight=0.2))
    state = init_train_state(params, tx)
    _, b1 = batcher.next_batch()
    _, b2 = batcher.next_batch()
    batch = fuse_dagger_batches(b1, b2)
    state2, m = step(state, batch, jax.random.PRNGKey(0))
    for k in ("loss", "il_loss", "sample_loss", "grad_norm",
              "node_overflow"):
        assert np.isfinite(float(m[k])), k
    leaf0 = jax.tree_util.tree_leaves(state.params)[0]
    leaf1 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))


@pytest.mark.slow
@pytest.mark.parametrize("remat", ["bounds", "ffn", "dots", "model",
                                   "probs", "wide", "model_probs",
                                   "model_wide"])
def test_remat_policies_loss_identical(tiny, remat):
    """Every remat policy computes the same loss and gradients as
    remat='full' — policies change what is SAVED for the backward, never
    the math (rollout.build_rollout remat modes)."""
    ro, params, batcher = tiny["ro"], tiny["params"], tiny["batcher"]
    _, b = batcher.next_batch()
    rng = jax.random.PRNGKey(11)

    def loss_with(remat):
        fn = ro.build_rollout("teacher", train_ml=True, deterministic=True,
                              remat=remat)
        def loss(p):
            return fn(p, b, rng)["ml_loss"]
        val, grad = jax.value_and_grad(loss)(params)
        gn = jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float64) ** 2)
            if jnp.issubdtype(x.dtype, jnp.floating) else a,
            grad, jnp.zeros((), jnp.float64))
        return float(val), float(gn)

    v_full, g_full = loss_with("full")
    v_pol, g_pol = loss_with(remat)
    np.testing.assert_allclose(v_pol, v_full, rtol=1e-6)
    np.testing.assert_allclose(g_pol, g_full, rtol=1e-5)


@pytest.mark.slow
def test_remat_probs_identical_under_dropout(tiny):
    """remat='probs' saves the dropout keep masks instead of regenerating
    them in the backward — with dropout ACTIVE the loss and gradients must
    still be bit-compatible with remat='full' under the same rng (the
    masks come from the same make_rng stream either way; the policy only
    changes what is saved).  The module fixture has all dropout rates at
    0.0, so build a dropout-enabled twin here."""
    cfg = GoatConfig(num_l_layers=1, num_x_layers=1, num_pano_layers=1,
                     hidden_size=32, num_attention_heads=2,
                     intermediate_size=64, vocab_size=64,
                     max_position_embeddings=64, image_feat_size=16,
                     hidden_dropout_prob=0.1,
                     attention_probs_dropout_prob=0.1, feat_dropout=0.0)
    rcfg = RolloutConfig(num_nodes=12, horizon=6, feat_dim=16)
    scans = [make_synthetic_scan("s0", num_vps=12, seed=0)]
    world = NavWorld.build(scans, feat_dim=16, seed=0)
    model = GoatModel(cfg)
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                              num_nodes=rcfg.num_nodes)
    ro = NavRollout(model, world, rcfg)
    graphs = {g.scan_id: g for g in scans}
    data = make_synthetic_dataset(graphs, 24, vocab_size=cfg.vocab_size,
                                  path_len=(3, 5), seed=1)
    batcher = EpisodeBatcher(data, graphs, ["s0"], batch_size=4,
                             max_instr_len=24, max_gt_len=7)
    _, b = batcher.next_batch()
    rng = jax.random.PRNGKey(5)

    def loss_with(remat):
        fn = ro.build_rollout("teacher", train_ml=True, deterministic=False,
                              remat=remat)

        def loss(p):
            return fn(p, b, rng)["ml_loss"]

        val, grad = jax.value_and_grad(loss)(params)
        gn = jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float64) ** 2)
            if jnp.issubdtype(x.dtype, jnp.floating) else a,
            grad, jnp.zeros((), jnp.float64))
        return float(val), float(gn)

    v_full, g_full = loss_with("full")
    v_pr, g_pr = loss_with("probs")
    np.testing.assert_allclose(v_pr, v_full, rtol=1e-6)
    np.testing.assert_allclose(g_pr, g_full, rtol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("remat", ["probs", "wide"])
def test_train_step_probs_policy_matches_full(tiny, remat):
    """The full DAgger train step under remat='probs'/'wide' (which also
    routes through build_teacher_rollout_vec's per-call checkpoint policy)
    produces the same loss as remat='full'."""
    ro, params, batcher = tiny["ro"], tiny["params"], tiny["batcher"]
    tx = make_optimizer(lr=1e-4)
    _, b = batcher.next_batch()
    rng = jax.random.PRNGKey(2)

    def run(remat):
        step = jax.jit(make_train_step(ro, tx, train_alg="dagger",
                                       ml_weight=0.2, remat=remat))
        state = init_train_state(params, tx)
        _, m = step(state, b, rng)
        return float(m["loss"]), float(m["grad_norm"])

    l_full, g_full = run("full")
    l_pol, g_pol = run(remat)
    np.testing.assert_allclose(l_pol, l_full, rtol=1e-6)
    np.testing.assert_allclose(g_pol, g_full, rtol=1e-5)
