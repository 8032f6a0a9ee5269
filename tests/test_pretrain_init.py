"""Pretrain-entry checkpoint init (--init_from): reference-format .pt
round-trip plus METER/LXMERT key surgery (train_r2r_goat.py:113-172).
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from vln_goat_tpu.config import GoatConfig
from vln_goat_tpu.pretrain.data import PretrainShapes, TrajBatchBuilder, \
    items_from_dataset
from vln_goat_tpu.pretrain.model import GoatPretrainModel
from vln_goat_tpu.pretrain.train import init_pretrain_params
from vln_goat_tpu.rollout.env import make_synthetic_dataset
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
from vln_goat_tpu.train.checkpoint import (flax_to_torch_pretrain,
                                           init_pretrain_from,
                                           surgery_init_keys, torch_to_flax)

TASKS = ("mlm", "sap", "cfp")


def _cfg():
    return GoatConfig(
        dataset="r2r", name="R2R", vocab_size=80, hidden_size=32,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=40, num_l_layers=1, num_pano_layers=1,
        num_x_layers=1, image_feat_size=16, feat_dropout=0.0)


@pytest.fixture(scope="module")
def rig():
    import jax.numpy as jnp

    g = make_synthetic_scan("pi0", num_vps=10, seed=4)
    graphs = {"pi0": g}
    feats = np.random.default_rng(0).standard_normal(
        (g.num_vps, 36, 16)).astype(np.float32)
    shapes = PretrainShapes(max_txt_len=12, max_steps=4, max_gmap=16,
                            max_mlm=4, mrc_prob_dim=16)
    builder = TrajBatchBuilder(graphs, ["pi0"], feats, shapes,
                               vocab_size=80, seed=0)
    items = items_from_dataset(
        make_synthetic_dataset(graphs, 4, vocab_size=79, path_len=(2, 3),
                               max_instr_len=12, seed=5), graphs)
    model = GoatPretrainModel(_cfg(), tasks=TASKS, image_prob_size=16)
    batches = {t: jax.tree.map(jnp.asarray, builder.build_batch(items, t))
               for t in TASKS}
    params = init_pretrain_params(model, jax.random.PRNGKey(0), batches)
    return dict(model=model, params=params, builder=builder, items=items)


def _leaves(tree, prefix=()):
    for k, v in sorted(tree.items()):
        if isinstance(v, dict):
            yield from _leaves(v, prefix + (k,))
        else:
            yield "/".join(prefix + (k,)), np.asarray(v)


@pytest.mark.slow
def test_reference_pt_roundtrip_init(rig, tmp_path):
    """flax params -> reference pretrain .pt -> --init_from restores every
    leaf exactly (the VERDICT-mandated wiring test)."""
    sd = flax_to_torch_pretrain(rig["params"])
    # the reference dump is flat bert.*/head.* torch tensors
    assert any(k.startswith("bert.embeddings.") for k in sd)
    assert any(k.startswith("mlm_head.") for k in sd)
    assert not any(k.startswith("vln_bert.") for k in sd)
    path = os.path.join(tmp_path, "model_step_best.pt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path)

    # fresh init with a different seed, then overlay the checkpoint
    import jax.numpy as jnp
    fresh = jax.tree.map(lambda x: jnp.zeros_like(x), rig["params"])
    restored, missing, extra = init_pretrain_from(path, "goat", fresh)
    assert missing == [], missing
    assert extra == [], extra
    want = dict(_leaves(rig["params"]["params"]))
    got = dict(_leaves(restored["params"]))
    assert set(want) == set(got)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


@pytest.mark.slow
def test_meter_surgery(rig, tmp_path):
    """METER-format keys land in embeddings/lang_encoder and BOTH cross
    encoders (train_r2r_goat.py:154-172)."""
    sd = flax_to_torch_pretrain(rig["params"])
    meter = {}
    for k, v in sd.items():
        t = torch.from_numpy(np.asarray(v))
        if k.startswith("bert.embeddings."):
            meter[k.replace("bert.", "text_transformer.")] = t
        elif k.startswith("bert.lang_encoder"):
            meter[k.replace("bert.lang_encoder",
                            "text_transformer.encoder")] = t
        elif k.startswith("bert.local_encoder.encoder.crossattention"):
            meter[k.replace("bert.local_encoder.encoder.crossattention",
                            "cross_modal_image_layers")] = t
        # everything else deliberately absent, like a real METER ckpt
    path = os.path.join(tmp_path, "meter.ckpt")
    torch.save({"state_dict": meter}, path)

    import jax.numpy as jnp
    fresh = jax.tree.map(lambda x: jnp.zeros_like(x), rig["params"])
    restored, missing, extra = init_pretrain_from(path, "meter", fresh)
    got = dict(_leaves(restored["params"]))
    want = dict(_leaves(rig["params"]["params"]))
    loaded = [k for k in got
              if k.startswith(("embeddings/", "lang_encoder/"))
              or "/crossattention" in k]
    assert loaded
    for k in loaded:
        # the surgery duplicates ONE cross-modal stack into BOTH encoders
        # (the meter ckpt has a single cross_modal_image_layers) — so the
        # global encoder must land on the LOCAL encoder's values
        src = k.replace("global_encoder/", "local_encoder/")
        np.testing.assert_array_equal(got[k], want[src], err_msg=k)
    # cross-modal layers must land in BOTH encoders
    assert any(k.startswith("local_encoder/") for k in loaded)
    assert any(k.startswith("global_encoder/") for k in loaded)
    # heads were not in the METER ckpt -> stay at the fresh value (zeros)
    head = [k for k in got if k.startswith("mlm_head/")]
    assert head and all(not got[k].any() for k in head)


def test_lxmert_surgery_key_mapping():
    """Pure key-space check for the lxmert branch (:127-151)."""
    sd = {
        "module.bert.encoder.layer.0.attention.self.query.weight":
            np.zeros((4, 4), np.float32),
        "bert.encoder.x_layers.1.attention.self.query.bias":
            np.zeros((4,), np.float32),
        "cls.predictions.transform.dense.weight":
            np.zeros((4, 4), np.float32),
    }
    out = surgery_init_keys(sd, "lxmert")
    assert "bert.lang_encoder.layer.0.attention.self.query.weight" in out
    assert "bert.local_encoder.encoder.x_layers.1.attention.self.query.bias" \
        in out
    assert "bert.global_encoder.encoder.x_layers.1.attention.self.query.bias" \
        in out
    assert "mlm_head.predictions.transform.dense.weight" in out
