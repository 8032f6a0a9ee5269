"""REVERIE object-navigation rollout: object tokens in the local branch,
OG predictions at the stop node, RGS metrics."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vln_goat_tpu.config import GoatConfig
from vln_goat_tpu.eval.metrics import reverie_eval_item, reverie_eval_metrics
from vln_goat_tpu.models.goat import GoatModel
from vln_goat_tpu.rollout.env import EpisodeBatcher, make_synthetic_dataset
from vln_goat_tpu.rollout.rollout import (NavRollout, RolloutConfig,
                                          assemble_trajectories)
from vln_goat_tpu.rollout.world import NavWorld
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
from vln_goat_tpu.train.params import init_goat_params

TINY_REV = GoatConfig.for_dataset(
    "reverie", num_l_layers=1, num_x_layers=1, num_pano_layers=1,
    hidden_size=32, num_attention_heads=2, intermediate_size=64,
    vocab_size=64, max_position_embeddings=64, image_feat_size=16,
    obj_feat_size=12, feat_dropout=0.0, hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0)

LO = 5  # objects per viewpoint


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    scans = [make_synthetic_scan("rv0", num_vps=12, seed=8)]
    g = scans[0]
    vtot = g.num_vps
    objects = dict(
        feat=rng.standard_normal((vtot, LO, 12)).astype(np.float32),
        loc=rng.standard_normal((vtot, LO, 7)).astype(np.float32),
        dir=rng.uniform(-np.pi, np.pi, (vtot, LO, 2)).astype(np.float32),
        mask=rng.random((vtot, LO)) < 0.8,
        name=rng.integers(0, 45, (vtot, LO)),
        oid=np.arange(vtot * LO).reshape(vtot, LO),
    )
    world = NavWorld.build(scans, feat_dim=16, objects=objects, seed=0)
    model = GoatModel(TINY_REV)
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                              num_nodes=20, max_obj=LO)
    rcfg = RolloutConfig(num_nodes=20, horizon=6, feat_dim=16)
    ro = NavRollout(model, world, rcfg)
    graphs = {"rv0": g}
    data = make_synthetic_dataset(graphs, 6, vocab_size=64, path_len=(3, 4),
                                  seed=9)
    batcher = EpisodeBatcher(data, graphs, ["rv0"], batch_size=3,
                             max_instr_len=24, max_gt_len=6)
    return dict(world=world, model=model, params=params, ro=ro, g=g,
                batcher=batcher, objects=objects)


def test_reverie_rollout_with_objects(setup):
    s = setup
    items, batch = s["batcher"].next_batch()
    fn = s["ro"].jitted(feedback="argmax", train_ml=False)
    out = jax.tree.map(np.asarray, fn(s["params"], batch, jax.random.PRNGKey(1)))
    assert "pred_obj_id" in out
    # predicted object ids must come from the stop node's object table
    batch_np = jax.tree.map(np.asarray, batch)
    for b in range(len(items)):
        stop_vp = out["node_vp"][b, out["stop_node"][b]]
        oid = out["pred_obj_id"][b]
        assert oid in set(s["objects"]["oid"][stop_vp]) | {-1}


def test_reverie_train_step_with_og_loss(setup):
    s = setup
    items, batch = s["batcher"].next_batch()
    # gt object slot: pick a valid object of the goal viewpoint
    B = len(items)
    gt_slot = np.zeros((B,), np.int32)
    off = 2 + s["world"].max_cands + 36
    for b, it in enumerate(items):
        goal = s["g"].index[it["path"][-1]]
        k = int(np.argmax(s["objects"]["mask"][goal]))
        gt_slot[b] = off + k
    batch = dict(batch, gt_obj_slot=jnp.asarray(gt_slot))
    fn = s["ro"].jitted(feedback="teacher", train_ml=True)
    out = fn(s["params"], batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(out["ml_loss"]))
    assert float(out["ml_loss"]) > 0


def test_reverie_metrics(setup):
    g = setup["g"]
    per = [
        reverie_eval_item(g.dist, [0, 1, 2], pred_objid=7, gt_path=[0, 1, 2],
                          goal_viewpoints=[2], gt_objid=7),
        reverie_eval_item(g.dist, [0, 1], pred_objid=3, gt_path=[0, 1, 2],
                          goal_viewpoints=[2], gt_objid=7),
    ]
    agg = reverie_eval_metrics(per)
    assert agg["sr"] == 50.0
    assert agg["rgs"] == 50.0
    assert agg["rgspl"] <= agg["spl"] + 1e-9


def test_object_angles_are_camera_relative(setup):
    """Object angle features must be recomputed per step relative to the
    agent camera (reverie/data_utils.py:90-93: angle_feature(obj_ang -
    base_heading, obj_ang_e - base_elevation)), not baked at heading 0."""
    import jax.numpy as jnp

    from vln_goat_tpu.core import geometry as G

    ro, world = setup["ro"], setup["world"]
    B = 2
    st = ro.init_state(
        dict(scan_idx=jnp.zeros((B,), jnp.int32),
             start_vp=jnp.asarray([0, 1], jnp.int32),
             gt_path=jnp.zeros((B, 4), jnp.int32),
             gt_len=jnp.full((B,), 2, jnp.int32),
             start_view=jnp.zeros((B,), jnp.int32),
             goal_vp=jnp.zeros((B,), jnp.int32)),
        need_dtw=False)
    # two different camera states at the same viewpoints
    for vi in (0, 17):
        st_v = {**st, "view_ix": jnp.full((B,), vi, jnp.int32)}
        pano = ro._pano_inputs(
            st_v, dict(scan_idx=jnp.zeros((B,), jnp.int32),
                       use_aug=None))
        K = pano["cands"]["local"].shape[1]
        Lo = setup["objects"]["feat"].shape[1]
        obj_loc = np.asarray(pano["loc"])[:, -Lo:]
        cam_h = np.asarray(pano["cam_h"])
        cam_e = np.asarray(pano["cam_e"])
        dirs = setup["objects"]["dir"][[0, 1]]     # start vps 0 and 1
        A = 4
        want = np.asarray(G.angle_feature_jnp(
            jnp.asarray(dirs[..., 0] - cam_h[:, None]),
            jnp.asarray(dirs[..., 1] - cam_e[:, None]), A))
        np.testing.assert_allclose(obj_loc[..., :A], want, atol=1e-5)
        # box features stay camera-independent
        np.testing.assert_allclose(
            obj_loc[..., A:], setup["objects"]["loc"][[0, 1]][..., A:],
            atol=1e-6)
