"""RxR nDTW-expert parity vs the REFERENCE expert computation.

The reference picks, among unvisited gmap nodes, the one maximizing
cal_dtw(shortest_distances, flat_traj + shortest_path(cur -> node)[1:],
gt_path)['nDTW'] (r2r/agent.py:333-340).  Here the REAL reference
`cal_dtw` (imported from /root/reference/map_nav_src/r2r/eval_utils.py,
pure numpy) re-scores every step of our scan-compiled ndtw-expert
teacher rollout host-side, with networkx shortest paths over the same
synthetic graph, and the device decision must achieve the reference's
best score at every active step.
"""
import os
import sys

import networkx as nx
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vln_goat_tpu.config import GoatConfig
from vln_goat_tpu.models.goat import GoatModel
from vln_goat_tpu.rollout.env import EpisodeBatcher, make_synthetic_dataset
from vln_goat_tpu.rollout.rollout import IGNORE_ID, NavRollout, RolloutConfig
from vln_goat_tpu.rollout.world import NavWorld
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
from vln_goat_tpu.train.params import init_goat_params

REF = "/root/reference/map_nav_src/r2r"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

TINY = GoatConfig(num_l_layers=1, num_x_layers=1, num_pano_layers=1,
                  hidden_size=32, num_attention_heads=2, intermediate_size=64,
                  vocab_size=64, max_position_embeddings=64,
                  image_feat_size=16, feat_dropout=0.0,
                  hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)


def _ref_cal_dtw():
    sys.path.insert(0, REF)
    try:
        from eval_utils import cal_dtw
    finally:
        sys.path.remove(REF)
    return cal_dtw


def _nx_graph(g):
    G = nx.Graph()
    G.add_nodes_from(range(g.num_vps))
    for v in range(g.num_vps):
        for k in range(g.cand_local.shape[1]):
            if g.cand_mask[v, k]:
                u = int(g.cand_local[v, k])
                G.add_edge(v, u, weight=float(g.cand_dist[v, k]))
    return G


def test_ndtw_expert_matches_reference_expert():
    cal_dtw = _ref_cal_dtw()
    g = make_synthetic_scan("nx0", num_vps=14, degree=3, seed=5)
    graphs = {"nx0": g}
    world = NavWorld.build([g], feat_dim=16, seed=0)
    model = GoatModel(TINY)
    N = 20
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                              num_nodes=N)
    rcfg = RolloutConfig(num_nodes=N, horizon=6, feat_dim=16,
                         expert_policy="ndtw", ndtw_future_len=10)
    ro = NavRollout(model, world, rcfg)
    data = make_synthetic_dataset(graphs, 12, vocab_size=64,
                                  path_len=(3, 5), seed=3)
    batcher = EpisodeBatcher(data, graphs, ["nx0"], batch_size=12,
                             max_instr_len=24, max_gt_len=6)
    _, batch = batcher.next_batch()
    # on-policy rollout: targets come from the nDTW EXPERT
    # (imitation targets would follow the gt path instead)
    fn = jax.jit(ro.build_rollout("argmax", train_ml=True,
                                  deterministic=True, record_logits=True))
    out = fn(params, batch, jax.random.PRNGKey(1))

    targets = np.asarray(out["targets"])          # [T, B] gmap slots
    segs = np.asarray(out["segs"])                # [T, B, seg_len] node idx
    node_vp = np.asarray(out["node_vp_t"])       # [T, B, N]
    visited = np.asarray(out["visited_t"])       # [T, B, N]
    cur_vp = np.asarray(out["cur_vp_t"])         # [T, B]
    active = np.asarray(out["active"])           # [T, B]
    gt_path = np.asarray(batch["gt_path"])
    gt_len = np.asarray(batch["gt_len"])
    T, B = targets.shape
    Gnx = _nx_graph(g)
    final_vp = node_vp[-1]                       # stable node -> vp map

    checked = 0
    for b in range(B):
        gt = [int(v) for v in gt_path[b, :gt_len[b]]]
        flat = [int(cur_vp[0, b])]               # start vp
        for t in range(T):
            if active[t, b] and targets[t, b] != IGNORE_ID:
                cur = int(cur_vp[t, b])
                if cur == gt[-1]:
                    assert targets[t, b] == 0, (t, b)
                elif targets[t, b] >= 2:
                    # reference expert sweep over unvisited gmap nodes
                    best = -1.0
                    scores = {}
                    for j in range(N):
                        vp = int(node_vp[t, b, j])
                        if vp < 0 or visited[t, b, j]:
                            continue
                        look = nx.dijkstra_path(Gnx, cur, vp)[1:]
                        sc = cal_dtw(g.dist, flat + look, gt,
                                     threshold=3.0)["nDTW"]
                        scores[j] = sc
                        best = max(best, sc)
                    j_dev = int(targets[t, b]) - 2
                    assert j_dev in scores, (t, b, j_dev, scores)
                    np.testing.assert_allclose(scores[j_dev], best,
                                               rtol=1e-5)
                    checked += 1
            # extend the flattened trajectory with the traversed segment
            # (segs record local viewpoint ids directly)
            for k in range(segs.shape[2]):
                v = int(segs[t, b, k])
                if v >= 0:
                    flat.append(v)
    assert checked >= 20, checked
