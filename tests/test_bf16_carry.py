"""GOAT_BF16_CARRY=1 stores the non-semantic scan carries (embed_sum,
last_embeds) in bfloat16.  The semantic tables (edist/ehops/enext,
stop_prob, embed_cnt) stay f32/int32, so trajectories under TEACHER
forcing are identical (actions don't depend on embeddings) and losses
stay close; under policy feedback only the model-input rounding differs.
"""
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

# several full rollout compiles — slow tier (the flag is opt-in and
# default-off; the fast tier never takes these paths)
pytestmark = [pytest.mark.slow]

B, HORIZON = 8, 9


@pytest.fixture(scope="module")
def rig():
    cfg = GoatConfig(num_l_layers=1, num_x_layers=1, num_pano_layers=1,
                     hidden_size=32, num_attention_heads=2,
                     intermediate_size=64, vocab_size=200,
                     max_position_embeddings=64, image_feat_size=32,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0, feat_dropout=0.0)
    rcfg = RolloutConfig(num_nodes=16, horizon=HORIZON, feat_dim=32)
    scans = [make_synthetic_scan(f"b{i}", num_vps=30, degree=3, seed=70 + i)
             for i in range(2)]
    world = NavWorld.build(scans, feat_dim=32, seed=0)
    model = GoatModel(cfg)
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                              num_nodes=rcfg.num_nodes)
    ro = NavRollout(model, world, rcfg)
    graphs = {g.scan_id: g for g in scans}
    data = make_synthetic_dataset(graphs, 64, vocab_size=cfg.vocab_size,
                                  path_len=(3, 5), seed=2, max_instr_len=32)
    batcher = EpisodeBatcher(data, graphs, [g.scan_id for g in scans],
                             batch_size=B, max_instr_len=32, max_gt_len=6)
    _, batch = batcher.next_batch()
    return dict(ro=ro, params=params, batch=batch)


def _run(rig, flag, feedback):
    os.environ["GOAT_BF16_CARRY"] = flag
    try:
        fn = rig["ro"].build_rollout(feedback, train_ml=True,
                                     deterministic=True)
        out = jax.jit(fn)(rig["params"], rig["batch"],
                          jax.random.PRNGKey(3))
        return jax.tree.map(np.asarray, out)
    finally:
        os.environ.pop("GOAT_BF16_CARRY", None)


@pytest.mark.parametrize("feedback", ["teacher", "sample"])
def test_bf16_carry_runs_and_is_close(rig, feedback):
    ref = _run(rig, "0", feedback)
    bf = _run(rig, "1", feedback)
    assert np.isfinite(bf["ml_loss"]).all()
    if feedback == "teacher":
        # teacher actions don't read the embeddings: same trajectories
        np.testing.assert_array_equal(bf["actions"], ref["actions"])
        # losses differ only by the bf16 rounding of the model inputs
        np.testing.assert_allclose(bf["ml_loss"], ref["ml_loss"], rtol=0.1,
                                   atol=0.05)


def test_bf16_carry_vec_teacher_matches_scan_teacher(rig):
    """The vectorized teacher (phase-C bf16 carries) must agree with the
    plain teacher scan under the same flag."""
    os.environ["GOAT_BF16_CARRY"] = "1"
    try:
        plain = jax.jit(rig["ro"].build_rollout(
            "teacher", train_ml=True, deterministic=True))(
            rig["params"], rig["batch"], jax.random.PRNGKey(3))
        vec = jax.jit(rig["ro"].build_teacher_rollout_vec(
            deterministic=True))(
            rig["params"], rig["batch"], jax.random.PRNGKey(3))
        np.testing.assert_allclose(float(vec["ml_loss"]),
                                   float(plain["ml_loss"]),
                                   rtol=2e-2, atol=1e-3)
    finally:
        os.environ.pop("GOAT_BF16_CARRY", None)
