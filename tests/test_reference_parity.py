"""Golden parity vs the reference torch model (imported from
/root/reference as an oracle at test time — skipped when absent).

A reference GlocalTextPathNavCMT is instantiated at a small config, its
random state dict is converted with train/checkpoint.torch_to_flax, and all
three forward modes must agree to fp32 tolerance.  This certifies
checkpoint compatibility end-to-end (capability #8 in SURVEY.md section 7).
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/map_nav_src"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")]

import jax
import jax.numpy as jnp

from vln_goat_tpu.config import GoatConfig
from vln_goat_tpu.models.goat import GoatModel
from vln_goat_tpu.train.checkpoint import torch_to_flax, flax_to_torch

H, HEADS, FF, VOCAB = 64, 4, 128, 120


def _ref_config(**kw):
    from transformers import PretrainedConfig

    c = PretrainedConfig()
    c.attn_implementation = "eager"
    c._attn_implementation = "eager"
    c.vocab_size = VOCAB
    c.hidden_size = H
    c.num_attention_heads = HEADS
    c.intermediate_size = FF
    c.max_position_embeddings = 80
    c.type_vocab_size = 1
    c.pad_token_id = 1
    c.layer_norm_eps = 1e-5
    c.hidden_act = "gelu"
    c.hidden_dropout_prob = 0.0
    c.attention_probs_dropout_prob = 0.0
    c.initializer_range = 0.02
    c.is_decoder = False
    c.add_cross_attention = False
    c.chunk_size_feed_forward = 0
    c.num_l_layers = 2
    c.num_pano_layers = 1
    c.num_x_layers = 1
    c.num_top_layer = 1
    c.num_hidden_layers = 2
    c.dataset = "r2r"
    c.name = "R2R"
    c.mode = "train"
    c.max_action_steps = 20
    c.image_feat_size = 32
    c.angle_feat_size = 4
    c.obj_feat_size = 0
    c.obj_loc_size = 3
    c.obj_name_vocab_size = 45
    c.graph_sprels = True
    c.glocal_fuse = True
    c.fix_lang_embedding = False
    c.fix_pano_embedding = False
    c.fix_local_branch = False
    c.update_lang_bert = True
    c.output_attentions = False
    c.pred_head_dropout_prob = 0.0
    c.max_instr_len = 60
    c.feat_dropout = 0.0
    c.adaptive_pano_fusion = True
    c.do_back_img = False
    c.do_back_txt = False
    c.do_front_img = False
    c.do_front_his = False
    c.do_front_txt = False
    c.cfp_temperature = 1.0
    c.do_back_txt_type = "type_2"
    c.do_back_img_type = "type_1"
    c.do_add_method = "door"
    c.use_obj_name = False
    for k, v in kw.items():
        setattr(c, k, v)
    return c


def _our_config(ref) -> GoatConfig:
    return GoatConfig(
        dataset="r2r", name=ref.name, mode=ref.mode, vocab_size=ref.vocab_size,
        hidden_size=ref.hidden_size, num_attention_heads=ref.num_attention_heads,
        intermediate_size=ref.intermediate_size,
        max_position_embeddings=ref.max_position_embeddings,
        layer_norm_eps=ref.layer_norm_eps, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, num_l_layers=ref.num_l_layers,
        num_pano_layers=ref.num_pano_layers, num_x_layers=ref.num_x_layers,
        image_feat_size=ref.image_feat_size, angle_feat_size=ref.angle_feat_size,
        obj_feat_size=ref.obj_feat_size, max_action_steps=ref.max_action_steps,
        graph_sprels=ref.graph_sprels, glocal_fuse=ref.glocal_fuse,
        adaptive_pano_fusion=ref.adaptive_pano_fusion,
        do_back_img=ref.do_back_img, do_back_txt=ref.do_back_txt,
        do_front_img=ref.do_front_img, do_front_his=ref.do_front_his,
        do_front_txt=ref.do_front_txt, do_back_txt_type=ref.do_back_txt_type,
        do_back_img_type=ref.do_back_img_type, do_add_method=ref.do_add_method,
        feat_dropout=0.0,
    )


@pytest.fixture(scope="module")
def ref_models():
    sys.path.insert(0, REF)
    # the reference targets an older transformers; shim moved helpers
    import transformers.modeling_utils as mu
    if not hasattr(mu, "apply_chunking_to_forward"):
        from transformers.pytorch_utils import apply_chunking_to_forward
        mu.apply_chunking_to_forward = apply_chunking_to_forward
    from models.vilmodel_GOAT import GlocalTextPathNavCMT

    torch.manual_seed(0)
    cfg = _ref_config()
    tm = GlocalTextPathNavCMT(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = torch_to_flax(sd)
    ours = GoatModel(_our_config(cfg))
    return dict(tm=tm, cfg=cfg, variables=variables, ours=ours, sd=sd)


def test_language_mode_parity(ref_models, rng):
    tm, ours, variables = (ref_models["tm"], ref_models["ours"],
                           ref_models["variables"])
    B, Lt = 2, 13
    ids = rng.integers(0, VOCAB, (B, Lt)).astype(np.int64)
    mask = np.ones((B, Lt), bool)
    mask[1, 9:] = False

    with torch.no_grad():
        ref = tm.forward_text(torch.from_numpy(ids),
                              torch.from_numpy(mask)).numpy()
    out = ours.apply(variables, jnp.asarray(ids), jnp.asarray(mask),
                     method=GoatModel.forward_text)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=1e-4)


def test_panorama_mode_parity(ref_models, rng):
    tm, ours, variables = (ref_models["tm"], ref_models["ours"],
                           ref_models["variables"])
    B, Lv = 2, 20
    view = rng.standard_normal((B, Lv, 32)).astype(np.float32)
    loc = rng.standard_normal((B, Lv, 7)).astype(np.float32)
    navt = np.zeros((B, Lv), np.int64)
    navt[:, :5] = 1
    # equal lengths: the reference's unmasked adaptive-fusion softmax makes
    # ragged batches depend on pad garbage (documented divergence)
    lens = np.array([Lv, Lv], np.int64)
    with torch.no_grad():
        pe, pm, pf = tm.forward_panorama_do_per_step(
            torch.from_numpy(view), torch.from_numpy(loc),
            torch.from_numpy(navt), torch.from_numpy(lens))
    masks = np.arange(Lv)[None, :] < lens[:, None]
    out_e, out_m, out_f = ours.apply(
        variables, jnp.asarray(view), jnp.asarray(loc),
        jnp.asarray(navt.astype(np.int32)), jnp.asarray(masks),
        method=GoatModel.forward_panorama)
    np.testing.assert_allclose(np.asarray(out_e), pe.numpy(), atol=5e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_f), pf.numpy(), atol=5e-5,
                               rtol=1e-4)


def test_navigation_mode_parity(ref_models, rng):
    tm, ours, variables = (ref_models["tm"], ref_models["ours"],
                           ref_models["variables"])
    B, Lt, Gn, K = 2, 9, 4, 3      # Gn nodes, K candidates
    G = Gn + 2
    L = K + 4 + 2                   # K cands + 4 views + stop + mem
    D = H

    txt = rng.standard_normal((B, Lt, D)).astype(np.float32)
    txt_mask = np.ones((B, Lt), bool)
    gmap_img = rng.standard_normal((B, G, D)).astype(np.float32)
    step_ids = rng.integers(0, 5, (B, G)).astype(np.int64)
    gmap_pos = rng.standard_normal((B, G, 7)).astype(np.float32)
    pair = np.abs(rng.standard_normal((B, G, G))).astype(np.float32)
    vp_img = rng.standard_normal((B, L, D)).astype(np.float32)
    vp_pos = rng.standard_normal((B, L, 14)).astype(np.float32)

    # vpid layout: gmap = [None, None, 'a','b','c','d']; node 'a','b' visited
    gmap_vpids = [[None, None, "a", "b", "c", "d"]] * B
    visited = np.zeros((B, G), bool)
    visited[:, 1] = True  # MEM flagged visited in reference layout
    visited[:, 2] = True
    visited[:, 3] = True
    gmap_masks = np.ones((B, G), bool)
    gmap_masks[:, 1] = False

    # local: [stop, MEM, cand 'c', cand 'a', cand 'e?'->'d', views...]
    vp_cand_vpids = [[None, None, "c", "a", "d"] + [None] * 4] * B
    vp_nav = np.zeros((B, L), bool)
    vp_nav[:, 0] = True
    vp_nav[:, 2:5] = True
    vp_masks = np.ones((B, L), bool)

    with torch.no_grad():
        ref = tm.forward_navigation_per_step(
            torch.from_numpy(txt), torch.from_numpy(txt_mask),
            torch.from_numpy(gmap_img), torch.from_numpy(step_ids),
            torch.from_numpy(gmap_pos), torch.from_numpy(gmap_masks),
            torch.from_numpy(pair), torch.from_numpy(visited), gmap_vpids,
            torch.from_numpy(vp_img), torch.from_numpy(vp_pos),
            torch.from_numpy(vp_masks), torch.from_numpy(vp_nav),
            None, vp_cand_vpids)

    # ours: local slot 2 -> gmap 4 ('c', unvisited), slot 3 -> gmap 2
    # ('a', visited -> backtrack sum), slot 4 -> gmap 5 ('d', unvisited)
    l2g = np.full((B, L), -1, np.int32)
    l2g[:, 2], l2g[:, 3], l2g[:, 4] = 4, 2, 5
    out = ours.apply(
        variables, jnp.asarray(txt), jnp.asarray(txt_mask),
        jnp.asarray(gmap_img), jnp.asarray(step_ids.astype(np.int32)),
        jnp.asarray(gmap_pos), jnp.asarray(gmap_masks), jnp.asarray(pair),
        jnp.asarray(visited), jnp.asarray(vp_img), jnp.asarray(vp_pos),
        jnp.asarray(vp_masks), jnp.asarray(vp_nav), jnp.asarray(l2g),
        method=GoatModel.forward_navigation)

    for key_ref, key_ours in [("global_logits", "global_logits"),
                              ("local_logits", "local_logits"),
                              ("fused_logits", "fused_logits"),
                              ("cls_embeds", "cls_embeds")]:
        r = ref[key_ref].numpy()
        o = np.asarray(out[key_ours])
        finite = np.isfinite(r)
        assert (finite == np.isfinite(o)).all(), key_ref
        np.testing.assert_allclose(o[finite], r[finite], atol=5e-5, rtol=1e-4,
                                   err_msg=key_ref)


@pytest.fixture(scope="module")
def ref_models_causal(ref_models):
    """Second oracle with all BACL/FACL interventions enabled."""
    from models.vilmodel_GOAT import GlocalTextPathNavCMT

    torch.manual_seed(1)
    cfg = _ref_config(do_back_txt=True, do_back_img=True, do_front_txt=True,
                      do_front_img=True, do_front_his=True)
    tm = GlocalTextPathNavCMT(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = torch_to_flax(sd)
    ours = GoatModel(_our_config(cfg))
    return dict(tm=tm, cfg=cfg, variables=variables, ours=ours)


def test_causal_language_parity(ref_models_causal, rng):
    """BACL text back-door (type_2 door merge) + FACL front-door
    (vilmodel_GOAT.py:121-160)."""
    m = ref_models_causal
    B, Lt, Z, C = 2, 11, 5, 4
    ids = rng.integers(0, VOCAB, (B, Lt)).astype(np.int64)
    mask = np.ones((B, Lt), bool)
    mask[1, 8:] = False
    zd = rng.standard_normal((B, Z, H)).astype(np.float32)
    zdp = rng.random((B, Z, 1)).astype(np.float32)
    zl = rng.standard_normal((B, Z, H)).astype(np.float32)
    zlp = rng.random((B, Z, 1)).astype(np.float32)
    front = rng.standard_normal((B, C, H)).astype(np.float32)

    with torch.no_grad():
        ref = m["tm"].forward_text(
            torch.from_numpy(ids), torch.from_numpy(mask),
            torch.from_numpy(zd), torch.from_numpy(zdp),
            torch.from_numpy(zl), torch.from_numpy(zlp),
            torch.from_numpy(front)).numpy()
    out = m["ours"].apply(
        m["variables"], jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(zd),
        jnp.asarray(zdp), jnp.asarray(zl), jnp.asarray(zlp),
        jnp.asarray(front), method=GoatModel.forward_text)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=1e-4)


def test_causal_panorama_parity(ref_models_causal, rng):
    """BACL image back-door type_1 (vilmodel_GOAT.py:661-667)."""
    m = ref_models_causal
    B, Lv, Z = 2, 18, 6
    view = rng.standard_normal((B, Lv, 32)).astype(np.float32)
    loc = rng.standard_normal((B, Lv, 7)).astype(np.float32)
    navt = np.zeros((B, Lv), np.int64)
    lens = np.array([Lv, Lv], np.int64)
    zi = rng.standard_normal((B, Z, 32)).astype(np.float32)
    zp = rng.random((B, Z, 1)).astype(np.float32)

    with torch.no_grad():
        pe, pm, pf = m["tm"].forward_panorama_do_per_step(
            torch.from_numpy(view), torch.from_numpy(loc),
            torch.from_numpy(navt), torch.from_numpy(lens),
            torch.from_numpy(zi), torch.from_numpy(zp))
    masks = np.arange(Lv)[None, :] < lens[:, None]
    out_e, _, out_f = m["ours"].apply(
        m["variables"], jnp.asarray(view), jnp.asarray(loc),
        jnp.asarray(navt.astype(np.int32)), jnp.asarray(masks),
        jnp.asarray(zi), jnp.asarray(zp), method=GoatModel.forward_panorama)
    np.testing.assert_allclose(np.asarray(out_e), pe.numpy(), atol=5e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_f), pf.numpy(), atol=5e-5,
                               rtol=1e-4)


def test_causal_navigation_front_door_parity(ref_models_causal, rng):
    """FACL FrontDoorEncoder in both branches (vilmodel_GOAT.py:759-772)."""
    m = ref_models_causal
    B, Lt, Gn, K, C = 2, 7, 3, 2, 4
    G, L, D = Gn + 2, K + 3 + 2, H
    txt = rng.standard_normal((B, Lt, D)).astype(np.float32)
    txt_mask = np.ones((B, Lt), bool)
    gmap_img = rng.standard_normal((B, G, D)).astype(np.float32)
    step_ids = rng.integers(0, 5, (B, G)).astype(np.int64)
    gmap_pos = rng.standard_normal((B, G, 7)).astype(np.float32)
    pair = np.abs(rng.standard_normal((B, G, G))).astype(np.float32)
    vp_img = rng.standard_normal((B, L, D)).astype(np.float32)
    vp_pos = rng.standard_normal((B, L, 14)).astype(np.float32)
    front_vp = rng.standard_normal((B, C, D)).astype(np.float32)
    front_gmap = rng.standard_normal((B, C, D)).astype(np.float32)

    gmap_vpids = [[None, None, "a", "b", "c"]] * B
    visited = np.zeros((B, G), bool)
    visited[:, 1] = True
    visited[:, 2] = True
    gmap_masks = np.ones((B, G), bool)
    gmap_masks[:, 1] = False
    vp_cand_vpids = [[None, None, "b", "c"] + [None] * 3] * B
    vp_nav = np.zeros((B, L), bool)
    vp_nav[:, 0] = True
    vp_nav[:, 2:4] = True
    vp_masks = np.ones((B, L), bool)

    with torch.no_grad():
        ref = m["tm"].forward_navigation_per_step(
            torch.from_numpy(txt), torch.from_numpy(txt_mask),
            torch.from_numpy(gmap_img), torch.from_numpy(step_ids),
            torch.from_numpy(gmap_pos), torch.from_numpy(gmap_masks),
            torch.from_numpy(pair), torch.from_numpy(visited), gmap_vpids,
            torch.from_numpy(vp_img), torch.from_numpy(vp_pos),
            torch.from_numpy(vp_masks), torch.from_numpy(vp_nav),
            None, vp_cand_vpids,
            front_vp_feats=torch.from_numpy(front_vp),
            front_gmap_feats=torch.from_numpy(front_gmap))

    l2g = np.full((B, L), -1, np.int32)
    l2g[:, 2], l2g[:, 3] = 3, 4
    out = m["ours"].apply(
        m["variables"], jnp.asarray(txt), jnp.asarray(txt_mask),
        jnp.asarray(gmap_img), jnp.asarray(step_ids.astype(np.int32)),
        jnp.asarray(gmap_pos), jnp.asarray(gmap_masks), jnp.asarray(pair),
        jnp.asarray(visited), jnp.asarray(vp_img), jnp.asarray(vp_pos),
        jnp.asarray(vp_masks), jnp.asarray(vp_nav), jnp.asarray(l2g),
        front_vp_feats=jnp.asarray(front_vp),
        front_gmap_feats=jnp.asarray(front_gmap),
        method=GoatModel.forward_navigation)

    for key in ("fused_logits", "cls_embeds"):
        r = ref[key].numpy()
        o = np.asarray(out[key])
        finite = np.isfinite(r)
        assert (finite == np.isfinite(o)).all()
        np.testing.assert_allclose(o[finite], r[finite], atol=5e-5, rtol=1e-4,
                                   err_msg=key)


def test_roundtrip_flax_torch_flax(ref_models):
    variables = ref_models["variables"]
    sd2 = flax_to_torch(variables, add_prefix="")
    variables2 = torch_to_flax(sd2)
    flat1 = jax.tree.leaves(variables)
    flat2 = jax.tree.leaves(variables2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
