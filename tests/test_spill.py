"""Node-table overflow spill policy (RolloutConfig.overflow_policy).

The reference GraphMap is unbounded (models/graph_utils.py:91); our fixed
table evicts the farthest unvisited node when full ('spill') instead of
silently dropping candidates ('drop').  A half-capacity table must still
navigate: teacher-forced episodes follow the exact gt path because the
expert's next node is always a just-inserted candidate of the current node
(protected from eviction).
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")

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

# multi-10s full-scale runs: slow tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


B = 6


@pytest.fixture(scope="module")
def rig():
    cfg = GoatConfig(num_l_layers=1, num_x_layers=1, num_pano_layers=1,
                     hidden_size=32, num_attention_heads=2,
                     intermediate_size=64, vocab_size=64,
                     max_position_embeddings=64, image_feat_size=16,
                     feat_dropout=0.0)
    scans = [make_synthetic_scan("sp0", num_vps=40, degree=4, seed=13)]
    graphs = {g.scan_id: g for g in scans}
    world = NavWorld.build(scans, feat_dim=16, seed=0)
    model = GoatModel(cfg)
    data = make_synthetic_dataset(graphs, B, vocab_size=64,
                                  path_len=(5, 7), max_instr_len=16, seed=3)
    batcher = EpisodeBatcher(data, graphs, ["sp0"], batch_size=B,
                             max_instr_len=16, max_gt_len=8)
    return dict(cfg=cfg, world=world, model=model, graphs=graphs,
                batcher=batcher)


def _run(rig, num_nodes, policy, feedback="teacher"):
    rcfg = RolloutConfig(num_nodes=num_nodes, horizon=8, feat_dim=16,
                         overflow_policy=policy)
    ro = NavRollout(rig["model"], rig["world"], rcfg)
    params = init_goat_params(rig["model"], jax.random.PRNGKey(0),
                              max_cands=16, num_nodes=num_nodes)
    fn = jax.jit(ro.build_rollout(feedback, train_ml=True))
    items = sorted(rig["batcher"].data, key=lambda d: d["instr_id"])
    batch = rig["batcher"].make_batch(items)
    out = fn(params, batch, jax.random.PRNGKey(0))
    out_np = {k: np.asarray(v) for k, v in out.items()}
    batch_np = {k: np.asarray(v) for k, v in batch.items()}
    return out_np, batch_np


def test_half_capacity_spill_navigates_exact_gt(rig):
    # generous capacity: measure how many nodes episodes actually create
    full, fb = _run(rig, 32, "spill")
    assert int(full["overflow_n"].sum()) == 0
    assert int(full["spilled_n"].sum()) == 0
    peak = int(full["n_nodes"].max())
    assert peak > 12   # the fixture really exercises growth

    # half-capacity with spill: the teacher still NAVIGATES — every forced
    # action lands on the next gt node (spilled-in candidates stay
    # addressable), nothing is dropped.  The recorded multi-hop routing
    # between gt nodes may differ from the full table (evictions sever
    # episodic routes through reused slots — documented approximation).
    half = max(peak // 2, 6)
    out, bn = _run(rig, half, "spill")
    assert int(out["spilled_n"].sum()) > 0          # the policy fired
    assert int(out["overflow_n"].sum()) == 0        # nothing dropped

    def arrivals(out_np):
        # sequence of arrival viewpoint ids per episode (actions record
        # vp ids, resolved at step time)
        T, Bn = out_np["actions"].shape
        seqs = []
        for i in range(Bn):
            seqs.append([int(out_np["actions"][t, i]) for t in range(T)
                         if out_np["actions"][t, i] >= 0])
        return seqs

    arr_full = arrivals(full)
    arr_half = arrivals(out)
    for i, (af, ah) in enumerate(zip(arr_full, arr_half)):
        gt = [int(v) for v in bn["gt_path"][i]][:int(bn["gt_len"][i])]
        assert ah == gt[1:], (i, ah, gt)            # navigates the gt path
        assert af == gt[1:], i                       # (same at full cap)

    # and the half-capacity trajectory still starts at the gt start and
    # passes the gt nodes in order
    p_half = assemble_trajectories(bn, out)
    for i, p in enumerate(p_half):
        gt = [int(v) for v in bn["gt_path"][i]][:int(bn["gt_len"][i])]
        it = iter(p)
        assert all(v in it for v in gt), (i, p, gt)  # ordered subsequence


def test_drop_policy_counts_overflow(rig):
    full, _ = _run(rig, 32, "drop")
    peak = int(full["n_nodes"].max())
    out, _ = _run(rig, max(peak // 2, 6), "drop")
    assert int(out["overflow_n"].sum()) > 0
    assert int(out["spilled_n"].sum()) == 0


def test_spill_argmax_completes(rig):
    out, bn = _run(rig, 8, "spill", feedback="argmax")
    assert int(out["spilled_n"].sum()) > 0
    # recorded trajectories only contain real viewpoints
    paths = assemble_trajectories(bn, out)
    V = rig["graphs"]["sp0"].num_vps
    for p in paths:
        assert all(0 <= v < V for v in p)
    assert np.isfinite(out["ml_loss"])
