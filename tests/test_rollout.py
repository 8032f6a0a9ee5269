"""End-to-end rollout tests on a synthetic world (SURVEY.md section 4: the
reference has zero tests; deterministic tiny-rollout integration tests are
our replacement for its empirical-validation-only strategy)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vln_goat_tpu.config import GoatConfig
from vln_goat_tpu.models.goat import GoatModel
from vln_goat_tpu.rollout.env import EpisodeBatcher, make_synthetic_dataset
from vln_goat_tpu.rollout.rollout import (NavRollout, RolloutConfig,
                                          assemble_trajectories)
from vln_goat_tpu.rollout.world import NavWorld
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
from vln_goat_tpu.train.params import init_goat_params
from vln_goat_tpu.eval.metrics import eval_item, eval_metrics


TINY = GoatConfig(num_l_layers=1, num_x_layers=1, num_pano_layers=1,
                  hidden_size=32, num_attention_heads=2, intermediate_size=64,
                  vocab_size=64, max_position_embeddings=64,
                  image_feat_size=16, feat_dropout=0.0,
                  hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)


@pytest.fixture(scope="module")
def setup():
    scans = [make_synthetic_scan(f"s{i}", num_vps=14, seed=i) for i in range(2)]
    world = NavWorld.build(scans, feat_dim=16, seed=0)
    model = GoatModel(TINY)
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                              num_nodes=24)
    rcfg = RolloutConfig(num_nodes=24, horizon=8, feat_dim=16)
    ro = NavRollout(model, world, rcfg)
    graphs = {g.scan_id: g for g in scans}
    data = make_synthetic_dataset(graphs, 8, vocab_size=64, path_len=(3, 5),
                                  seed=1)
    batcher = EpisodeBatcher(data, graphs, [g.scan_id for g in scans],
                             batch_size=4, max_instr_len=32, max_gt_len=8)
    return dict(world=world, model=model, params=params, ro=ro,
                graphs=graphs, scans=scans, batcher=batcher)


def test_teacher_rollout_follows_gt_path(setup):
    """With feedback='teacher' the agent must reproduce the ground-truth
    trajectory exactly (the expert picks gt_path[t+1] each step)."""
    s = setup
    items, batch = s["batcher"].next_batch()
    fn = s["ro"].jitted(feedback="teacher", train_ml=True)
    out = fn(s["params"], batch, jax.random.PRNGKey(1))
    out_np = jax.tree.map(np.asarray, out)
    batch_np = jax.tree.map(np.asarray, batch)
    paths = assemble_trajectories(batch_np, out_np)
    for b, it in enumerate(items):
        g = s["graphs"][it["scan"]]
        gt_local = [g.index[v] for v in it["path"]]
        # predicted path must contain the gt path as its prefix (the final
        # stop-backtrack may append a return to the best stop node)
        assert paths[b][:len(gt_local)] == gt_local, (b, paths[b], gt_local)
    assert np.isfinite(out_np["ml_loss"])
    assert out_np["ml_loss"] > 0


def test_teacher_targets_match_gt(setup):
    s = setup
    items, batch = s["batcher"].next_batch()
    fn = s["ro"].jitted(feedback="teacher", train_ml=True)
    out = jax.tree.map(np.asarray, fn(s["params"], batch, jax.random.PRNGKey(2)))
    node_vp = out["node_vp"]
    batch_np = jax.tree.map(np.asarray, batch)
    for b, it in enumerate(items):
        g = s["graphs"][it["scan"]]
        gt_local = [g.index[v] for v in it["path"]]
        T = len(gt_local)
        for t in range(min(T, out["targets"].shape[0])):
            tgt = out["targets"][t, b]
            if t == T - 1:
                assert tgt == 0  # stop
                break
            assert tgt >= 2
            assert node_vp[b, tgt - 2] == gt_local[t + 1], (b, t)


def test_argmax_rollout_paths_are_connected(setup):
    s = setup
    items, batch = s["batcher"].next_batch()
    fn = s["ro"].jitted(feedback="argmax", train_ml=False)
    out = jax.tree.map(np.asarray, fn(s["params"], batch, jax.random.PRNGKey(3)))
    batch_np = jax.tree.map(np.asarray, batch)
    paths = assemble_trajectories(batch_np, out)
    for b, it in enumerate(items):
        g = s["graphs"][it["scan"]]
        p = paths[b]
        assert p[0] == g.index[it["path"][0]]
        for a, bnode in zip(p[:-1], p[1:]):
            assert g.hops[a, bnode] == 1, f"non-adjacent hop {a}->{bnode}"


def test_eval_metrics_on_teacher_rollout(setup):
    """Teacher rollout = gt path; without the stop-backtrack (which with
    untrained weights picks an arbitrary node) SR must be 100%."""
    s = setup
    items, batch = s["batcher"].next_batch()
    fn = s["ro"].jitted(feedback="teacher", train_ml=False)
    out = jax.tree.map(np.asarray, fn(s["params"], batch, jax.random.PRNGKey(4)))
    batch_np = jax.tree.map(np.asarray, batch)
    paths = assemble_trajectories(batch_np, out, include_backtrack=False)
    per = []
    for b, it in enumerate(items):
        g = s["graphs"][it["scan"]]
        gt_local = [g.index[v] for v in it["path"]]
        per.append(eval_item(g.dist, paths[b], gt_local))
    agg = eval_metrics(per)
    assert agg["sr"] == 100.0
    assert agg["nDTW"] > 50.0


@pytest.mark.slow
def test_episodic_fw_matches_full_after_visit_all(setup):
    """Walk every node of a scan; the episodic FW tables must then agree
    with the true all-pairs shortest paths restricted to observed edges."""
    import networkx as nx
    s = setup
    g = s["scans"][0]
    # drive the rollout state machine directly
    model, world = s["model"], s["world"]
    ro = NavRollout(model, world, RolloutConfig(num_nodes=24, horizon=8,
                                                feat_dim=16))
    order = list(range(g.num_vps))
    batch = dict(scan_idx=jnp.zeros((1,), jnp.int32),
                 start_vp=jnp.zeros((1,), jnp.int32),
                 start_view=jnp.zeros((1,), jnp.int32))
    st = ro.init_state(batch)
    # visit every node: insert into table then arrive
    for v in order[1:]:
        # place the node (if unseen) by making it "current"
        vp = jnp.asarray([v], jnp.int32)
        match = np.asarray(st["node_vp"][0]) == v
        if match.any():
            idx = int(np.argmax(match))
        else:
            idx = int(st["n_nodes"][0])
            st["node_vp"] = st["node_vp"].at[0, idx].set(v)
            st["n_nodes"] = st["n_nodes"] + 1
        st["cur"] = jnp.asarray([idx], jnp.int32)
        st = ro._arrive(st, batch, st["cur"], jnp.zeros((1,), bool))

    node_vp = np.asarray(st["node_vp"][0])
    n = int(st["n_nodes"][0])
    ed = np.asarray(st["edist"][0])
    for i in range(n):
        for j in range(n):
            a, b = node_vp[i], node_vp[j]
            if a < 0 or b < 0:
                continue
            assert abs(ed[i, j] - g.dist[a, b]) < 1e-3, (a, b, ed[i, j],
                                                         g.dist[a, b])
