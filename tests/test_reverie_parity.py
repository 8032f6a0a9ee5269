"""Golden REVERIE parity vs the reference oracle: object tokens in the
panorama branch and OG logits in navigation, through the converter.

The reference packs [views[:view_len], objs[:obj_len]] ragged
(vilmodel_GOAT.py:697-726); we use fixed slots with masks.  With masked
attention and no positional encoding the encoders are permutation
-equivariant, so token outputs must agree under the slot mapping.
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
from vln_goat_tpu.train.checkpoint import torch_to_flax

from tests.test_reference_parity import _our_config, _ref_config, H, VOCAB

DOBJ = 12
LO = 3


@pytest.fixture(scope="module")
def reverie_oracle():
    sys.path.insert(0, REF)
    import transformers.modeling_utils as mu
    if not hasattr(mu, "apply_chunking_to_forward"):
        from transformers.pytorch_utils import apply_chunking_to_forward
        mu.apply_chunking_to_forward = apply_chunking_to_forward
    from models.vilmodel_GOAT import GlocalTextPathNavCMT

    torch.manual_seed(5)
    cfg = _ref_config(name="REVERIE", dataset="reverie", obj_feat_size=DOBJ,
                      use_obj_name=True)
    tm = GlocalTextPathNavCMT(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = torch_to_flax(sd)
    ours = GoatModel(_our_config(cfg).replace(
        dataset="reverie", use_obj_name=True))
    return dict(tm=tm, cfg=cfg, variables=variables, ours=ours)


def test_reverie_panorama_parity(reverie_oracle, rng):
    m = reverie_oracle
    B, Lv = 2, 14
    view = rng.standard_normal((B, Lv, 32)).astype(np.float32)
    obj = rng.standard_normal((B, LO, DOBJ)).astype(np.float32)
    obj_names = rng.integers(0, 45, (B, LO)).astype(np.int64)
    loc = rng.standard_normal((B, Lv + LO, 7)).astype(np.float32)
    navt = np.zeros((B, Lv + LO), np.int64)
    navt[:, :4] = 1
    navt[:, Lv:] = 2
    view_lens = np.array([Lv, Lv], np.int64)
    obj_lens = np.array([LO, LO - 1], np.int64)

    # reference ragged: concat(view[:vl], obj[:ol]); loc/nav indexed over
    # that ragged layout — build ref loc/nav by compacting ours
    ref_loc = np.zeros_like(loc)
    ref_nav = np.zeros_like(navt)
    for b in range(B):
        rows = list(range(Lv)) + [Lv + k for k in range(obj_lens[b])]
        ref_loc[b, :len(rows)] = loc[b, rows]
        ref_nav[b, :len(rows)] = navt[b, rows]

    with torch.no_grad():
        pe, pm, pf = m["tm"].forward_panorama_do_per_step(
            torch.from_numpy(view), torch.from_numpy(ref_loc),
            torch.from_numpy(ref_nav), torch.from_numpy(view_lens),
            None, None, torch.from_numpy(obj),
            torch.from_numpy(obj_lens), torch.from_numpy(obj_names))

    masks = np.ones((B, Lv), bool)
    obj_masks = np.arange(LO)[None, :] < obj_lens[:, None]
    oe, om, of = m["ours"].apply(
        m["variables"], jnp.asarray(view), jnp.asarray(loc),
        jnp.asarray(navt.astype(np.int32)), jnp.asarray(masks),
        obj_fts=jnp.asarray(obj), obj_masks=jnp.asarray(obj_masks),
        obj_names=jnp.asarray(obj_names.astype(np.int32)),
        method=GoatModel.forward_panorama)

    oe_np = np.asarray(oe)
    ref_np = pe.numpy()
    for b in range(B):
        # views align 1:1; objects: our slot Lv+k <-> ref slot vl+k
        np.testing.assert_allclose(oe_np[b, :Lv], ref_np[b, :Lv], atol=5e-5,
                                   rtol=1e-4, err_msg=f"views b={b}")
        for k in range(int(obj_lens[b])):
            np.testing.assert_allclose(
                oe_np[b, Lv + k], ref_np[b, Lv + k], atol=5e-5, rtol=1e-4,
                err_msg=f"obj b={b} k={k}")
    # fused: b=0 has no padding anywhere -> exact parity; b=1 has one
    # padded obj slot (reference pools over it; ours masks) -> skip
    np.testing.assert_allclose(np.asarray(of)[0], pf.numpy()[0], atol=5e-5,
                               rtol=1e-4)


def test_reverie_navigation_obj_logits_parity(reverie_oracle, rng):
    m = reverie_oracle
    B, Lt, Gn, K = 2, 7, 3, 2
    G = Gn + 2
    Lp = K + 2 + LO          # cands + views + objects
    L = Lp + 2
    D = H
    txt = rng.standard_normal((B, Lt, D)).astype(np.float32)
    txt_mask = np.ones((B, Lt), bool)
    gmap_img = rng.standard_normal((B, G, D)).astype(np.float32)
    step_ids = rng.integers(0, 5, (B, G)).astype(np.int64)
    gmap_pos = rng.standard_normal((B, G, 7)).astype(np.float32)
    pair = np.abs(rng.standard_normal((B, G, G))).astype(np.float32)
    vp_img = rng.standard_normal((B, L, D)).astype(np.float32)
    vp_pos = rng.standard_normal((B, L, 14)).astype(np.float32)

    gmap_vpids = [[None, None, "a", "b", "c"]] * B
    visited = np.zeros((B, G), bool)
    visited[:, 1] = True
    visited[:, 2] = True
    gmap_masks = np.ones((B, G), bool)
    gmap_masks[:, 1] = False
    vp_cand_vpids = [[None, None, "b", "c"] + [None] * (2 + LO)] * B
    vp_nav = np.zeros((B, L), bool)
    vp_nav[:, 0] = True
    vp_nav[:, 2:4] = True
    vp_masks = np.ones((B, L), bool)
    vp_obj = np.zeros((B, L), bool)
    vp_obj[:, 2 + K + 2:] = True      # the LO object tokens

    with torch.no_grad():
        ref = m["tm"].forward_navigation_per_step(
            torch.from_numpy(txt), torch.from_numpy(txt_mask),
            torch.from_numpy(gmap_img), torch.from_numpy(step_ids),
            torch.from_numpy(gmap_pos), torch.from_numpy(gmap_masks),
            torch.from_numpy(pair), torch.from_numpy(visited), gmap_vpids,
            torch.from_numpy(vp_img), torch.from_numpy(vp_pos),
            torch.from_numpy(vp_masks), torch.from_numpy(vp_nav),
            torch.from_numpy(vp_obj), vp_cand_vpids)

    l2g = np.full((B, L), -1, np.int32)
    l2g[:, 2], l2g[:, 3] = 3, 4
    out = m["ours"].apply(
        m["variables"], jnp.asarray(txt), jnp.asarray(txt_mask),
        jnp.asarray(gmap_img), jnp.asarray(step_ids.astype(np.int32)),
        jnp.asarray(gmap_pos), jnp.asarray(gmap_masks), jnp.asarray(pair),
        jnp.asarray(visited), jnp.asarray(vp_img), jnp.asarray(vp_pos),
        jnp.asarray(vp_masks), jnp.asarray(vp_nav), jnp.asarray(l2g),
        vp_obj_masks=jnp.asarray(vp_obj),
        method=GoatModel.forward_navigation)

    assert out["obj_logits"] is not None
    r = ref["obj_logits"].numpy()
    o = np.asarray(out["obj_logits"])
    finite = np.isfinite(r)
    assert (finite == np.isfinite(o)).all()
    np.testing.assert_allclose(o[finite], r[finite], atol=5e-5, rtol=1e-4)
    rf = ref["fused_logits"].numpy()
    of = np.asarray(out["fused_logits"])
    finite = np.isfinite(rf)
    np.testing.assert_allclose(of[finite], rf[finite], atol=5e-5, rtol=1e-4)
