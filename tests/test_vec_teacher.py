"""Vectorized teacher rollout parity: build_teacher_rollout_vec must be
loss- AND grad-identical to build_rollout('teacher', train_ml=True) when
deterministic (the trajectory is parameter-independent under teacher
forcing, so batching the pano encoder over [T*B] steps is a pure
reassociation).  Also covers the hoisted text K/V cross-attention cache
(forward_text_kv) at the layer level.

Reference semantics being preserved: the teacher-forced IL rollout of
map_nav_src/r2r/agent.py:422-445 (one CE term per step, sum/B)."""
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



def _mk(num_nodes=12, horizon=6, n_eps=12, batch_size=4, seed=0):
    cfg = GoatConfig(num_l_layers=1, num_x_layers=1, num_pano_layers=1,
                     hidden_size=32, num_attention_heads=2,
                     intermediate_size=64, vocab_size=64,
                     max_position_embeddings=64, image_feat_size=16,
                     hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                     feat_dropout=0.0)
    rcfg = RolloutConfig(num_nodes=num_nodes, horizon=horizon, feat_dim=16)
    scans = [make_synthetic_scan("s0", num_vps=12, seed=seed)]
    world = NavWorld.build(scans, feat_dim=16, seed=seed)
    model = GoatModel(cfg)
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                              num_nodes=rcfg.num_nodes)
    ro = NavRollout(model, world, rcfg)
    graphs = {g.scan_id: g for g in scans}
    data = make_synthetic_dataset(graphs, n_eps, vocab_size=cfg.vocab_size,
                                  path_len=(3, 5), seed=seed + 1)
    batcher = EpisodeBatcher(data, graphs, ["s0"], batch_size=batch_size,
                             max_instr_len=24, max_gt_len=7)
    return ro, params, batcher


@pytest.fixture(scope="module")
def tiny():
    ro, params, batcher = _mk()
    return dict(ro=ro, params=params, batcher=batcher)


def test_vec_teacher_loss_matches_scan(tiny):
    ro, params, batcher = tiny["ro"], tiny["params"], tiny["batcher"]
    _, batch = batcher.next_batch()
    rng = jax.random.PRNGKey(7)
    scan_fn = jax.jit(ro.build_rollout("teacher", train_ml=True,
                                       deterministic=True))
    vec_fn = jax.jit(ro.build_teacher_rollout_vec(deterministic=True))
    out_s = scan_fn(params, batch, rng)
    out_v = vec_fn(params, batch, rng)
    np.testing.assert_allclose(float(out_v["ml_loss"]),
                               float(out_s["ml_loss"]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_v["targets"]),
                                  np.asarray(out_s["targets"]))
    np.testing.assert_allclose(np.asarray(out_v["loss_per_ep"]),
                               np.asarray(out_s["loss_per_ep"]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_v["overflow_n"]),
                                  np.asarray(out_s["overflow_n"]))
    np.testing.assert_array_equal(np.asarray(out_v["n_nodes"]),
                                  np.asarray(out_s["n_nodes"]))


def test_vec_teacher_grads_match_scan(tiny):
    ro, params, batcher = tiny["ro"], tiny["params"], tiny["batcher"]
    _, batch = batcher.next_batch()
    rng = jax.random.PRNGKey(11)
    scan_fn = ro.build_rollout("teacher", train_ml=True, deterministic=True)
    vec_fn = ro.build_teacher_rollout_vec(deterministic=True)

    def loss_s(p):
        return scan_fn(p, batch, rng)["ml_loss"]

    def loss_v(p):
        return vec_fn(p, batch, rng)["ml_loss"]

    g_s = jax.jit(jax.grad(loss_s))(params)
    g_v = jax.jit(jax.grad(loss_v))(params)
    flat_s = jax.tree_util.tree_leaves_with_path(g_s)
    flat_v = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_v)}
    for k, v in flat_s:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(flat_v[ks]), np.asarray(v), rtol=2e-5, atol=1e-6,
            err_msg=ks)


def test_vec_teacher_spill_parity():
    """A node table too small for the episode forces the spill policy;
    the vec path must replay the recorded emb_clear exactly."""
    ro, params, batcher = _mk(num_nodes=5, horizon=6, seed=3)
    _, batch = batcher.next_batch()
    rng = jax.random.PRNGKey(13)
    out_s = jax.jit(ro.build_rollout("teacher", train_ml=True,
                                     deterministic=True))(params, batch, rng)
    out_v = jax.jit(ro.build_teacher_rollout_vec(
        deterministic=True))(params, batch, rng)
    assert int(np.asarray(out_s["spilled_n"]).sum()) > 0, \
        "fixture did not exercise the spill policy"
    np.testing.assert_array_equal(np.asarray(out_v["spilled_n"]),
                                  np.asarray(out_s["spilled_n"]))
    np.testing.assert_array_equal(np.asarray(out_v["targets"]),
                                  np.asarray(out_s["targets"]))
    np.testing.assert_allclose(float(out_v["ml_loss"]),
                               float(out_s["ml_loss"]), rtol=1e-6)


def test_vec_teacher_reverie_og_parity():
    """Objnav branch: object tokens + OG loss at the goal step must match
    the scan rollout (agent_obj_goat.py:676-690 OG supervision)."""
    rng_np = np.random.default_rng(0)
    cfg = GoatConfig.for_dataset(
        "reverie", num_l_layers=1, num_x_layers=1, num_pano_layers=1,
        hidden_size=32, num_attention_heads=2, intermediate_size=64,
        vocab_size=64, max_position_embeddings=64, image_feat_size=16,
        obj_feat_size=12, feat_dropout=0.0, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    LO = 5
    scans = [make_synthetic_scan("rv0", num_vps=12, seed=8)]
    g = scans[0]
    objects = dict(
        feat=rng_np.standard_normal((g.num_vps, LO, 12)).astype(np.float32),
        loc=rng_np.standard_normal((g.num_vps, LO, 7)).astype(np.float32),
        dir=rng_np.uniform(-np.pi, np.pi, (g.num_vps, LO, 2)).astype(
            np.float32),
        mask=rng_np.random((g.num_vps, LO)) < 0.8,
        name=rng_np.integers(0, 45, (g.num_vps, LO)),
        oid=np.arange(g.num_vps * LO).reshape(g.num_vps, LO),
    )
    world = NavWorld.build(scans, feat_dim=16, objects=objects, seed=0)
    model = GoatModel(cfg)
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                              num_nodes=20, max_obj=LO)
    rcfg = RolloutConfig(num_nodes=20, horizon=6, feat_dim=16)
    ro = NavRollout(model, world, rcfg)
    data = make_synthetic_dataset({"rv0": g}, 6, vocab_size=64,
                                  path_len=(3, 4), seed=9)
    batcher = EpisodeBatcher(data, {"rv0": g}, ["rv0"], batch_size=3,
                             max_instr_len=24, max_gt_len=6)
    items, batch = batcher.next_batch()
    off = 2 + world.max_cands + 36
    gt_slot = np.zeros((len(items),), np.int32)
    for b, it in enumerate(items):
        goal = g.index[it["path"][-1]]
        gt_slot[b] = off + int(np.argmax(objects["mask"][goal]))
    batch = dict(batch, gt_obj_slot=jnp.asarray(gt_slot))
    rng = jax.random.PRNGKey(2)
    out_s = jax.jit(ro.build_rollout("teacher", train_ml=True,
                                     deterministic=True))(params, batch, rng)
    out_v = jax.jit(ro.build_teacher_rollout_vec(
        deterministic=True))(params, batch, rng)
    assert float(out_s["ml_loss"]) > 0
    np.testing.assert_allclose(float(out_v["ml_loss"]),
                               float(out_s["ml_loss"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_v["loss_per_ep"]),
                               np.asarray(out_s["loss_per_ep"]), rtol=1e-6)


def test_text_kv_cache_layer_parity():
    """CrossmodalEncoder(kv_caches=precomputed) == plain call: the hoisted
    per-layer K/V projections are the exact same matmuls, applied once."""
    from vln_goat_tpu.models.layers import CrossmodalEncoder

    cfg = GoatConfig(num_x_layers=2, hidden_size=32, num_attention_heads=2,
                     intermediate_size=64, hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    enc = CrossmodalEncoder(cfg)
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(jax.random.fold_in(rng, 1), (2, 7, 32))
    kv = jax.random.normal(jax.random.fold_in(rng, 2), (2, 9, 32))
    qm = jnp.ones((2, 7), bool)
    kvm = jnp.ones((2, 9), bool).at[0, 7:].set(False)
    params = enc.init(rng, q, qm, kv, kvm)
    out_plain = enc.apply(params, q, qm, kv, kvm)
    caches = enc.apply(params, None, None, kv, None, kv_only=True)
    out_cached = enc.apply(params, q, qm, kv, kvm, kv_caches=caches)
    np.testing.assert_allclose(np.asarray(out_cached), np.asarray(out_plain),
                               rtol=1e-6, atol=1e-7)
