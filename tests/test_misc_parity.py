"""Smaller parity surfaces: expl_sample feedback, Critic head, trajectory
JSON dump, dataset presets."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vln_goat_tpu.config import GoatConfig
from vln_goat_tpu.models.goat import Critic, GoatModel
from vln_goat_tpu.rollout.env import EpisodeBatcher, make_synthetic_dataset
from vln_goat_tpu.rollout.rollout import (NavRollout, RolloutConfig,
                                          trajectory_to_json)
from vln_goat_tpu.rollout.world import NavWorld
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
from vln_goat_tpu.train.params import init_goat_params

TINY = GoatConfig(num_l_layers=1, num_x_layers=1, num_pano_layers=1,
                  hidden_size=32, num_attention_heads=2, intermediate_size=64,
                  vocab_size=64, max_position_embeddings=64,
                  image_feat_size=16, feat_dropout=0.0)


def test_config_presets():
    rxr = GoatConfig.for_dataset("rxr")
    assert rxr.max_instr_len == 250 and rxr.max_action_len == 28
    rev = GoatConfig.for_dataset("reverie")
    assert rev.obj_feat_size == 768 and rev.use_obj_name and rev.is_objnav
    soon = GoatConfig.for_dataset("soon")
    assert soon.is_objnav and not soon.use_obj_name
    # JSON round-trip
    s = rxr.to_json()
    assert GoatConfig.from_json(s) == rxr


def test_critic_head():
    c = Critic(TINY)
    x = jnp.ones((3, 32))
    v = c.init(jax.random.PRNGKey(0), x)
    out = c.apply(v, x)
    assert out.shape == (3,)
    # torch-format key names round-trip through the converter
    from vln_goat_tpu.train.checkpoint import flax_to_torch, torch_to_flax
    sd = flax_to_torch(v, add_prefix="")
    assert "state2value.0.weight" in sd and "state2value.3.weight" in sd
    back = torch_to_flax(sd)
    np.testing.assert_array_equal(
        np.asarray(back["params"]["state2value_0"]["kernel"]),
        np.asarray(v["params"]["state2value_0"]["kernel"]))


@pytest.fixture(scope="module")
def rollout_setup():
    scans = [make_synthetic_scan("m0", num_vps=12, seed=6)]
    world = NavWorld.build(scans, feat_dim=16, seed=0)
    model = GoatModel(TINY)
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                              num_nodes=16)
    ro = NavRollout(model, world, RolloutConfig(num_nodes=16, horizon=5,
                                                feat_dim=16))
    graphs = {g.scan_id: g for g in scans}
    data = make_synthetic_dataset(graphs, 6, vocab_size=64, path_len=(3, 4),
                                  seed=7)
    batcher = EpisodeBatcher(data, graphs, ["m0"], batch_size=3,
                             max_instr_len=20, max_gt_len=6)
    return dict(ro=ro, params=params, batcher=batcher, graphs=graphs)


def test_expl_sample_feedback(rollout_setup):
    s = rollout_setup
    _, batch = s["batcher"].next_batch()
    fn = jax.jit(s["ro"].build_rollout(feedback="expl_sample", train_ml=True))
    out = jax.tree.map(np.asarray, fn(s["params"], batch,
                                      jax.random.PRNGKey(3)))
    assert np.isfinite(out["ml_loss"])


def test_trajectory_json_dump(rollout_setup):
    s = rollout_setup
    items, batch = s["batcher"].next_batch()
    fn = s["ro"].jitted(feedback="argmax", train_ml=False)
    out = jax.tree.map(np.asarray, fn(s["params"], batch,
                                      jax.random.PRNGKey(4)))
    batch_np = jax.tree.map(np.asarray, batch)
    g = s["graphs"]["m0"]
    j = trajectory_to_json(batch_np, out, 0, vp_ids=g.vp_ids)
    assert j["path"][0] == items[0]["path"][0]
    assert j["stop_node"] in j["nodes"] or j["stop_node"] in j["path"]
    import json
    json.dumps(j)  # serializable
