"""nDTW expert (RxR): the associative-scan DTW row must match the classic
O(n*m) DP, and the ndtw-expert rollout must run and supervise sensibly."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vln_goat_tpu.config import GoatConfig
from vln_goat_tpu.eval.metrics import cal_dtw
from vln_goat_tpu.models.goat import GoatModel
from vln_goat_tpu.rollout.env import EpisodeBatcher, make_synthetic_dataset
from vln_goat_tpu.rollout.rollout import (NavRollout, RolloutConfig,
                                          dtw_extend_row, dtw_init_row)
from vln_goat_tpu.rollout.world import NavWorld
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
from vln_goat_tpu.train.params import init_goat_params

TINY = GoatConfig(num_l_layers=1, num_x_layers=1, num_pano_layers=1,
                  hidden_size=32, num_attention_heads=2, intermediate_size=64,
                  vocab_size=64, max_position_embeddings=64,
                  image_feat_size=16, feat_dropout=0.0,
                  hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)


def test_dtw_rows_match_reference_dp(rng):
    g = make_synthetic_scan("d0", num_vps=15, seed=0)
    pred = [0, 3, 5, 7, 9]
    ref = [0, 2, 7, 11]
    # classic DP (eval_utils.cal_dtw semantics)
    want = cal_dtw(g.dist, pred, ref)["DTW"]

    Tg = len(ref)
    row = dtw_init_row((1,), Tg + 1)
    for p in pred:
        cost = jnp.asarray(g.dist[p, np.asarray(ref)][None])
        row = dtw_extend_row(row, cost)
    got = float(row[0, Tg])
    assert abs(got - want) < 1e-3, (got, want)


def test_dtw_extend_row_masking(rng):
    g = make_synthetic_scan("d1", num_vps=10, seed=1)
    ref = [0, 4, 8]
    row = dtw_init_row((2,), 4)
    cost = jnp.asarray(np.stack([g.dist[1, np.asarray(ref)],
                                 g.dist[2, np.asarray(ref)]]))
    # batch elem 1 masked: row must stay unchanged
    out = dtw_extend_row(row, cost, valid=jnp.asarray([True, False]))
    assert not np.allclose(np.asarray(out[0]), np.asarray(row[0]))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(row[1]))


@pytest.fixture(scope="module")
def setup():
    scans = [make_synthetic_scan("nd0", num_vps=14, seed=2)]
    world = NavWorld.build(scans, feat_dim=16, seed=0)
    model = GoatModel(TINY)
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                              num_nodes=20)
    rcfg = RolloutConfig(num_nodes=20, horizon=6, feat_dim=16,
                         expert_policy="ndtw")
    ro = NavRollout(model, world, rcfg)
    graphs = {g.scan_id: g for g in scans}
    data = make_synthetic_dataset(graphs, 8, vocab_size=64, path_len=(3, 5),
                                  seed=3)
    batcher = EpisodeBatcher(data, graphs, ["nd0"], batch_size=4,
                             max_instr_len=24, max_gt_len=7)
    return dict(ro=ro, params=params, batcher=batcher, graphs=graphs)


def test_ndtw_expert_rollout_runs(setup):
    s = setup
    items, batch = s["batcher"].next_batch()
    fn = s["ro"].jitted(feedback="sample", train_ml=True)
    out = jax.tree.map(np.asarray,
                       fn(s["params"], batch, jax.random.PRNGKey(5)))
    assert np.isfinite(out["ml_loss"]) and out["ml_loss"] > 0
    # targets must be stop (0) or valid gmap slots, never MEM
    tgt = out["targets"]
    valid = tgt[tgt >= 0]
    assert ((valid == 0) | (valid >= 2)).all()


def test_ndtw_expert_first_step_matches_host_dp(setup):
    """At t=0 the expert's choice must equal the host-computed argmax-nDTW
    candidate (reference expert semantics)."""
    s = setup
    items, batch = s["batcher"].next_batch()
    fn = s["ro"].jitted(feedback="teacher", train_ml=True)
    # teacher feedback uses IL expert; run sample to get ndtw targets
    fn = s["ro"].jitted(feedback="sample", train_ml=True)
    out = jax.tree.map(np.asarray,
                       fn(s["params"], batch, jax.random.PRNGKey(6)))
    node_vp = out["node_vp"]
    batch_np = jax.tree.map(np.asarray, batch)
    g = s["graphs"]["nd0"]
    for b, it in enumerate(items):
        gt = [g.index[v] for v in it["path"]]
        start = gt[0]
        if start == gt[-1]:
            continue
        # host: candidates of start, ndtw of [start] + path(start->cand)
        best_vp, best_score = None, -1.0
        n_cand = int(g.cand_mask[start].sum())
        for k in range(n_cand):
            w = int(g.cand_local[start, k])
            path = [start] + g.shortest_path(start, w)
            nd = cal_dtw(g.dist, path, gt)["nDTW"]
            if nd > best_score:
                best_score, best_vp = nd, w
        t0_target = out["targets"][0, b]
        assert t0_target >= 2
        assert node_vp[b, t0_target - 2] == best_vp, (
            b, node_vp[b, t0_target - 2], best_vp)
