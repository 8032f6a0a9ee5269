"""SOON branch: annotation loader (the reference never shipped its soon/
env — do_utils/do_intervention.py:343,166-170 defines the jsonl schema it
reads), config preset (vlnbert_init.py:152-155: name='SOON',
use_obj_name=False), and an objnav rollout at the SOON preset."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vln_goat_tpu.config import GoatConfig
from vln_goat_tpu.data.annotations import construct_instrs

# multi-10s full-scale runs: slow tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow



def _write_soon_jsonl(tmp_path):
    items = [
        dict(path_id=7, scan="sc0", path=["v0", "v1", "v2"], heading=0.3,
             instructions=[{"full": "find the lamp in the study"},
                           {"full": "go to the lamp"}],
             instr_encodings=[[0, 11, 12, 2], [0, 13, 2]],
             obj_pseudo_label={"obj_id": 4, "heading": 0.1}),
        dict(path_id=8, scan="sc0", path=["v2", "v3"], heading=1.0,
             instructions=[{"full": "walk to the piano"}],
             instr_encodings=[[0, 21, 22, 2]]),
    ]
    p = os.path.join(tmp_path, "train_enc_pseudo_obj_label.jsonl")
    with open(p, "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")
    return tmp_path


def test_soon_loader(tmp_path):
    anno = _write_soon_jsonl(str(tmp_path))
    out = construct_instrs(anno, "soon", ["train"], max_instr_len=16)
    items = out["train"]
    assert len(items) == 3
    assert items[0]["instruction"] == "find the lamp in the study"
    assert items[0]["objId"] == 4
    assert items[0]["instr_id"] == "7_4_0"
    assert items[2]["instruction"] == "walk to the piano"
    assert "objId" not in items[2]
    assert items[0]["instr_encoding"] == [0, 11, 12, 2]


def test_soon_config_preset():
    cfg = GoatConfig.for_dataset("soon")
    assert cfg.name == "SOON"
    assert cfg.obj_feat_size == 768
    assert cfg.use_obj_name is False
    assert cfg.is_objnav


def test_soon_rollout_smoke():
    """Objnav rollout at the SOON preset (use_obj_name=False path of
    CausalImageEmbeddings, vilmodel_GOAT.py:277-301)."""
    from vln_goat_tpu.models.goat import GoatModel
    from vln_goat_tpu.rollout.env import (EpisodeBatcher,
                                          make_synthetic_dataset)
    from vln_goat_tpu.rollout.rollout import NavRollout, RolloutConfig
    from vln_goat_tpu.rollout.world import NavWorld
    from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
    from vln_goat_tpu.train.params import init_goat_params

    cfg = GoatConfig.for_dataset(
        "soon", num_l_layers=1, num_x_layers=1, num_pano_layers=1,
        hidden_size=32, num_attention_heads=2, intermediate_size=64,
        vocab_size=64, max_position_embeddings=64, image_feat_size=16,
        obj_feat_size=8, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, feat_dropout=0.0)
    rcfg = RolloutConfig(num_nodes=12, horizon=4, feat_dim=16)
    scans = [make_synthetic_scan("sc0", num_vps=10, seed=0)]
    vtot, Lo = 10, 3
    rng = np.random.default_rng(0)
    objects = dict(
        feat=rng.standard_normal((vtot, Lo, 8)).astype(np.float32),
        loc=rng.standard_normal((vtot, Lo, 7)).astype(np.float32),
        mask=np.ones((vtot, Lo), bool),
        name=rng.integers(0, 45, (vtot, Lo)),
        oid=rng.integers(0, 20, (vtot, Lo)),
    )
    world = NavWorld.build(scans, feat_dim=16, objects=objects, seed=0)
    model = GoatModel(cfg)
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                              num_nodes=rcfg.num_nodes)
    ro = NavRollout(model, world, rcfg)
    graphs = {g.scan_id: g for g in scans}
    data = make_synthetic_dataset(graphs, 8, vocab_size=cfg.vocab_size,
                                  path_len=(2, 3), seed=1)
    batcher = EpisodeBatcher(data, graphs, ["sc0"], batch_size=4,
                             max_instr_len=16, max_gt_len=4)
    _, batch = batcher.next_batch()
    fn = jax.jit(ro.build_rollout("argmax", train_ml=False))
    out = fn(params, batch, jax.random.PRNGKey(0))
    assert "pred_obj_id" in out
    assert np.asarray(out["pred_obj_id"]).shape == (4,)
