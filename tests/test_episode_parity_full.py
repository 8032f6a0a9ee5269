"""Whole-episode parity at the PRODUCTION model configuration
(6 lang / 2 pano / 3 cross layers x 768 hidden — vlnbert_init.py:89-155),
closing the reduced-depth blind spot of test_episode_parity (2/1/1).

One batch of >=8 episodes: identical greedy paths, matching teacher-forced
IL loss.  Slow (full-width torch oracle on CPU + full-depth jit) — marked
`slow`.
"""
import os
import sys
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/map_nav_src"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference repo not mounted"),
]

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

import oracle_harness as OH
from test_episode_parity import _flip_margin, _our_paths
from vln_goat_tpu.models.goat import GoatModel
from vln_goat_tpu.rollout.env import EpisodeBatcher, make_synthetic_dataset
from vln_goat_tpu.rollout.rollout import NavRollout, RolloutConfig
from vln_goat_tpu.rollout.world import NavWorld
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
from vln_goat_tpu.train.checkpoint import torch_to_flax

B = 8
N_NODES = 32


@pytest.fixture(scope="module")
def stack():
    scans = [make_synthetic_scan("f0", num_vps=24, degree=3, seed=21)]
    graphs = {g.scan_id: g for g in scans}
    scan_order = sorted(graphs)
    vtot = sum(g.num_vps for g in scans)
    rng = np.random.default_rng(17)
    features = rng.standard_normal((vtot, 36, 768)).astype(np.float32)
    data = make_synthetic_dataset(graphs, B, vocab_size=50265,
                                  path_len=(3, 6), seed=23)
    for i, it in enumerate(data):
        it["path_id"] = i

    tmp = tempfile.mkdtemp(prefix="oracle_parity_full_")
    # NO layer overrides: the parser defaults are the production 6/2/3
    agent, env, args = OH.build_ref_stack(graphs, features, data, tmp,
                                          batch_size=B)
    assert (args.num_l_layers, args.num_pano_layers, args.num_x_layers) \
        == (6, 2, 3)
    agent.vln_bert = OH.NavRecorder(agent.vln_bert)
    agent.vln_bert.eval()
    agent.critic.eval()

    sd = {k: v.detach().numpy()
          for k, v in agent.vln_bert.vln_bert.state_dict().items()}
    variables = torch_to_flax(sd)

    cfg = OH.goat_config_from_ref_args(args)
    assert (cfg.num_l_layers, cfg.num_pano_layers, cfg.num_x_layers) \
        == (6, 2, 3) and cfg.hidden_size == 768
    model = GoatModel(cfg)
    rcfg = RolloutConfig(num_nodes=N_NODES, horizon=args.max_action_len,
                         feat_dim=768)
    world = NavWorld.build([graphs[s] for s in scan_order],
                           features=features, feat_dim=768)
    ro = NavRollout(model, world, rcfg)
    batcher = EpisodeBatcher(data, graphs, scan_order, batch_size=B,
                             max_instr_len=60, max_gt_len=10)
    return dict(agent=agent, env=env, args=args, graphs=graphs,
                scan_order=scan_order, variables=variables, ro=ro,
                batcher=batcher)


def test_full_config_argmax_and_teacher_parity(stack):
    agent, env = stack["agent"], stack["env"]

    # ---- greedy decode: identical paths over >= 8 episodes ----
    env.reset_epoch(shuffle=False)
    agent.feedback = "argmax"
    agent.vln_bert.records.clear()
    trajs = agent.rollout(test=True)
    records = list(agent.vln_bert.records)
    items = list(env.batch)
    ours, out_np, _ = _our_paths(stack, items, "argmax", record=True)
    n_eps = 0
    hard, ties = [], []
    for i, (it, tr, our_path) in enumerate(zip(items, trajs, ours)):
        assert tr["instr_id"] == it["instr_id"]
        ref_path = OH.flatten_ref_traj(tr)
        if ref_path != our_path:
            margin = _flip_margin(stack, records, out_np, items, i)
            if margin is not None and margin < 1e-2:
                ties.append((it["instr_id"], margin))
            else:
                hard.append((it["instr_id"], margin, ref_path, our_path))
        n_eps += 1
    assert n_eps >= 8
    assert not hard, hard[:3]
    assert len(ties) <= 1, ties

    # ---- teacher-forced: matching IL loss at full depth ----
    env.reset_epoch(shuffle=False)
    agent.feedback = "teacher"
    agent.loss = 0
    trajs = agent.rollout(train_ml=1.0, test=True)
    ref_loss = float(agent.loss)
    items = list(env.batch)
    ours, out_np, _ = _our_paths(stack, items, "teacher")
    for it, tr, our_path in zip(items, trajs, ours):
        assert OH.flatten_ref_traj(tr) == our_path, it["instr_id"]
    np.testing.assert_allclose(float(out_np["ml_loss"]), ref_loss,
                               rtol=5e-3)
