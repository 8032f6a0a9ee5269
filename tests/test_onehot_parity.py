"""GOAT_ONEHOT=1 (broadcast-compare one-hot contractions) must reproduce
the scatter/gather path exactly: one-hot selection through 0/1 f32 weights
is value-exact (each output element is one source value plus zeros; int
payloads < 2^24), and every ±inf-valued table (stop_prob) uses masked
`where`.  Checked on losses, gradients, and full trajectory records for
the training sample rollout, the teacher rollout (scan and vectorized),
and greedy decode — r2r (SPL expert) and rxr (nDTW expert + spill).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_goat_tpu.config import GoatConfig
from vln_goat_tpu.models.goat import GoatModel
from vln_goat_tpu.rollout.env import EpisodeBatcher, make_synthetic_dataset
from vln_goat_tpu.rollout.rollout import NavRollout, RolloutConfig
from vln_goat_tpu.rollout.world import NavWorld
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
from vln_goat_tpu.train import trainer as TR
from vln_goat_tpu.train.params import init_goat_params

# multi-10s full-scale runs: slow tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow



def _build(dataset="r2r", num_vps=30, num_nodes=24, horizon=6, **rkw):
    cfg = GoatConfig.for_dataset(dataset)
    cfg = cfg.replace(num_l_layers=2, num_pano_layers=1, num_x_layers=1)
    rcfg = RolloutConfig(num_nodes=num_nodes, horizon=horizon,
                         feat_dim=cfg.image_feat_size, **rkw)
    scans = [make_synthetic_scan(f"s{i}", num_vps=num_vps, degree=3, seed=i)
             for i in range(2)]
    world = NavWorld.build(scans, feat_dim=cfg.image_feat_size, seed=0)
    model = GoatModel(cfg, dtype=jnp.float32)
    params = init_goat_params(model, jax.random.PRNGKey(0),
                              max_cands=world.max_cands,
                              num_nodes=rcfg.num_nodes)
    ro = NavRollout(model, world, rcfg)
    graphs = {g.scan_id: g for g in scans}
    data = make_synthetic_dataset(graphs, 16, vocab_size=cfg.vocab_size,
                                  path_len=(3, 5), seed=1, max_instr_len=24)
    batcher = EpisodeBatcher(data, graphs, [g.scan_id for g in scans],
                             batch_size=8, max_instr_len=24, max_gt_len=6)
    _, batch = batcher.next_batch()
    return model, params, ro, batch


def _with_onehot(flag, fn):
    old = os.environ.get("GOAT_ONEHOT")
    os.environ["GOAT_ONEHOT"] = flag
    try:
        return fn()
    finally:
        if old is None:
            os.environ.pop("GOAT_ONEHOT", None)
        else:
            os.environ["GOAT_ONEHOT"] = old


def _cmp_trees(a, b, atol):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for (path, xa), xb in zip(flat_a, flat_b):
        xa, xb = np.asarray(xa), np.asarray(xb)
        if xa.dtype == bool or np.issubdtype(xa.dtype, np.integer):
            assert (xa == xb).all(), f"{path}: int/bool mismatch"
        else:
            np.testing.assert_allclose(xa, xb, atol=atol, rtol=0,
                                       err_msg=str(path))


@pytest.mark.parametrize("dataset,rkw", [
    ("r2r", {}),
    ("rxr", {"expert_policy": "ndtw", "overflow_policy": "spill"}),
])
def test_sample_rollout_loss_grad_parity(dataset, rkw):
    model, params, ro, batch = _build(dataset, **rkw)
    rng = jax.random.PRNGKey(3)

    def run():
        fn = ro.build_rollout("sample", train_ml=True, deterministic=True)

        def loss(p):
            out = fn(p, batch, rng)
            return out["ml_loss"], out

        (l, out), g = jax.jit(
            lambda p: jax.value_and_grad(loss, has_aux=True)(p))(params)
        return l, out, g

    l0, out0, g0 = _with_onehot("0", run)
    l1, out1, g1 = _with_onehot("1", run)
    # trajectories and targets are integer records: must match exactly
    for k in ("actions", "segs", "targets", "node_vp", "stop_node",
              "final_cur", "n_nodes", "overflow_n", "spilled_n"):
        assert (np.asarray(out0[k]) == np.asarray(out1[k])).all(), k
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               atol=1e-6, rtol=0)
    _cmp_trees(g0, g1, atol=2e-5)


def test_teacher_vec_and_decode_parity():
    model, params, ro, batch = _build("r2r")
    rng = jax.random.PRNGKey(5)

    def run():
        tfn = ro.build_teacher_rollout_vec(deterministic=True)
        dfn = ro.build_rollout("argmax", train_ml=False, deterministic=True)
        t = jax.jit(tfn)(params, batch, rng)
        d = jax.jit(dfn)(params, batch, rng)
        return t, d

    (t0, d0) = _with_onehot("0", run)
    (t1, d1) = _with_onehot("1", run)
    np.testing.assert_allclose(np.asarray(t0["ml_loss"]),
                               np.asarray(t1["ml_loss"]), atol=1e-6, rtol=0)
    assert (np.asarray(t0["targets"]) == np.asarray(t1["targets"])).all()
    for k in ("actions", "segs", "node_vp", "stop_node", "final_cur"):
        assert (np.asarray(d0[k]) == np.asarray(d1[k])).all(), k


@pytest.mark.slow
def test_large_world_ids_above_256_with_spill():
    """Regime where bf16-truncated one-hot contractions corrupt payloads
    (ADVICE r3): viewpoint ids > 256 (not exactly representable in bf16)
    plus overflow-spill pressure on the node table (near-INF edist rows).
    _esum forces Precision.HIGHEST so the one-hot path must stay exact on
    EVERY backend, including TPU's default-bf16 matmul units."""
    model, params, ro, batch = _build(
        "rxr", num_vps=340, num_nodes=10, horizon=8,
        expert_policy="ndtw", overflow_policy="spill")
    rng = jax.random.PRNGKey(11)

    def run():
        fn = ro.build_rollout("sample", train_ml=True, deterministic=True)
        out = jax.jit(fn)(params, batch, rng)
        dfn = ro.build_rollout("argmax", train_ml=False, deterministic=True)
        d = jax.jit(dfn)(params, batch, rng)
        return out, d

    (out0, d0) = _with_onehot("0", run)
    (out1, d1) = _with_onehot("1", run)
    # node_vp carries raw viewpoint ids — above 256 these are NOT bf16-exact,
    # so any default-precision contraction would corrupt them
    assert int(np.asarray(out1["node_vp"]).max()) > 256
    for k in ("actions", "segs", "targets", "node_vp", "stop_node",
              "final_cur", "n_nodes", "overflow_n", "spilled_n"):
        assert (np.asarray(out0[k]) == np.asarray(out1[k])).all(), k
    for k in ("actions", "segs", "node_vp", "stop_node", "final_cur"):
        assert (np.asarray(d0[k]) == np.asarray(d1[k])).all(), k
    np.testing.assert_allclose(np.asarray(out0["ml_loss"]),
                               np.asarray(out1["ml_loss"]), atol=1e-6, rtol=0)


def test_dagger_train_step_parity():
    model, params, ro, batch = _build("r2r")
    tx = TR.make_optimizer(lr=1e-4)

    def run():
        state = TR.init_train_state(params, tx)
        step = jax.jit(TR.make_train_step(ro, tx, train_alg="dagger",
                                          ml_weight=0.2, remat="full",
                                          teacher_horizon=6))
        state, m = step(state, batch, jax.random.PRNGKey(7))
        return m["loss"], state.params

    l0, p0 = _with_onehot("0", run)
    l1, p1 = _with_onehot("1", run)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               atol=1e-6, rtol=0)
    _cmp_trees(p0, p1, atol=1e-6)
