"""Active-episode compaction (build_rollout compact="t:d,..."): chunked
scans that gather still-active episodes into a prefix and run later chunks
at B/d.  Every per-episode computation is row-independent, so losses,
per-episode losses, trajectories and gradients must match the plain
full-B scan exactly (deterministic mode; under dropout only the draws
differ — documented randomness-parity divergence)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vln_goat_tpu.config import GoatConfig
from vln_goat_tpu.models.goat import GoatModel
from vln_goat_tpu.rollout.env import EpisodeBatcher, make_synthetic_dataset
from vln_goat_tpu.rollout.rollout import NavRollout, RolloutConfig
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
from vln_goat_tpu.rollout.world import NavWorld
from vln_goat_tpu.train.params import init_goat_params

B = 8
HORIZON = 9


@pytest.fixture(scope="module")
def rig():
    cfg = GoatConfig(num_l_layers=1, num_x_layers=1, num_pano_layers=1,
                     hidden_size=32, num_attention_heads=2,
                     intermediate_size=64, vocab_size=200,
                     max_position_embeddings=64, image_feat_size=32,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0, feat_dropout=0.0)
    rcfg = RolloutConfig(num_nodes=16, horizon=HORIZON, feat_dim=32)
    scans = [make_synthetic_scan(f"c{i}", num_vps=30, degree=3, seed=60 + i)
             for i in range(2)]
    world = NavWorld.build(scans, feat_dim=32, seed=0)
    model = GoatModel(cfg)
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                              num_nodes=rcfg.num_nodes)
    ro = NavRollout(model, world, rcfg)
    graphs = {g.scan_id: g for g in scans}
    data = make_synthetic_dataset(graphs, 4 * B, vocab_size=cfg.vocab_size,
                                  path_len=(2, 4), seed=3)
    batcher = EpisodeBatcher(data, graphs, sorted(graphs), batch_size=B,
                             max_instr_len=24, max_gt_len=5)
    return dict(params=params, ro=ro, batcher=batcher)


@pytest.mark.slow
@pytest.mark.parametrize("feedback,spec", [
    ("sample", "3:2"),
    ("sample", "3:2,6:4"),
    ("fused_dagger", "4:2"),
])
def test_compact_loss_grad_trajectory_identical(rig, feedback, spec):
    ro, batcher = rig["ro"], rig["batcher"]
    _, batch = batcher.next_batch()
    if feedback == "fused_dagger":
        batch = dict(batch)
        batch["is_teacher"] = jnp.arange(B) % 2 == 0
    rng = jax.random.PRNGKey(7)

    def make(compact):
        fn = ro.build_rollout(feedback, train_ml=True, deterministic=True,
                              remat="full", compact=compact)

        def loss(params):
            out = fn(params, batch, rng)
            return out["ml_loss"], out

        return loss

    (l0, out0), g0 = jax.value_and_grad(make(""), has_aux=True)(
        rig["params"])
    (l1, out1), g1 = jax.value_and_grad(make(spec), has_aux=True)(
        rig["params"])

    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out0["loss_per_ep"]),
                               np.asarray(out1["loss_per_ep"]),
                               rtol=0, atol=1e-6)
    # trajectories and final tables must be identical episode-by-episode
    for k in ("actions", "segs", "seg_hops", "targets", "node_vp",
              "stop_node", "final_cur", "n_nodes", "overflow_n"):
        np.testing.assert_array_equal(np.asarray(out0[k]),
                                      np.asarray(out1[k]), err_msg=k)
    # gradients identical (compaction only removes masked no-op rows)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_compact_spec_parser():
    from vln_goat_tpu.rollout.rollout import _compact_spec
    assert _compact_spec("6:2,10:4", 15, 64) == [(6, 2), (10, 4)]
    # out-of-horizon boundary, non-dividing and non-increasing divisors drop
    assert _compact_spec("6:2,20:4", 15, 64) == [(6, 2)]
    assert _compact_spec("6:3", 15, 64) == []
    assert _compact_spec("6:2,8:2", 15, 64) == [(6, 2)]
    assert _compact_spec("", 15, 64) == []
    assert _compact_spec(None, 15, 64) == []  # env fallback (unset)
