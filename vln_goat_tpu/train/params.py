"""Parameter initialisation for the multi-mode GOAT model.

The reference initializes every submodule in one nn.Module constructor
(vilmodel_GOAT.py:556-626).  In flax, each apply-method only touches its own
branch, so we init all modes on dummy shapes and deep-merge the trees.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import GoatConfig
from ..models.goat import GoatModel


def _merge(a: Dict, b: Dict) -> Dict:
    out = dict(a)
    for k, v in b.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def init_goat_params(model: GoatModel, rng: jax.Array,
                     max_cands: int = 16, num_nodes: int = 48,
                     max_obj: int = 20) -> Dict[str, Any]:
    c = model.config
    B, Lt = 2, 8
    Lp = max_cands + 36
    D = c.hidden_size
    r1, r2, r3 = jax.random.split(rng, 3)

    txt_ids = jnp.zeros((B, Lt), jnp.int32)
    txt_masks = jnp.ones((B, Lt), bool)
    tkw = {}
    if c.do_back_txt:
        tkw.update(z_direc_embeds=jnp.zeros((B, 4, D)),
                   z_direc_pzs=jnp.zeros((B, 4, 1)),
                   z_landm_embeds=jnp.zeros((B, 4, D)),
                   z_landm_pzs=jnp.zeros((B, 4, 1)))
    if c.do_front_txt:
        tkw.update(front_txt_embeds=jnp.zeros((B, 4, D)))
    v_text = model.init(r1, txt_ids, txt_masks, method=GoatModel.forward_text,
                       **tkw)

    pkw = {}
    if c.do_back_img:
        pkw.update(z_img_features=jnp.zeros((B, 4, c.image_feat_size)),
                   z_img_pzs=jnp.zeros((B, 4, 1)))
    if c.is_objnav:
        pkw.update(obj_fts=jnp.zeros((B, max_obj, c.obj_feat_size)),
                   obj_loc_fts=jnp.zeros((B, max_obj, c.angle_feat_size + 3)),
                   obj_masks=jnp.ones((B, max_obj), bool),
                   obj_names=jnp.zeros((B, max_obj), jnp.int32))
        Lfull = Lp + max_obj
    else:
        Lfull = Lp
    v_pano = model.init(
        r2, jnp.zeros((B, Lp, c.image_feat_size)),
        jnp.zeros((B, Lfull if c.is_objnav else Lp, c.angle_feat_size + 3)),
        jnp.zeros((B, Lfull if c.is_objnav else Lp), jnp.int32),
        jnp.ones((B, Lp), bool), method=GoatModel.forward_panorama, **pkw)

    G = num_nodes + 2
    L = Lfull + 2
    nkw = {}
    if c.do_front_img:
        nkw["front_vp_feats"] = jnp.zeros((B, 4, D))
    if c.do_front_his:
        nkw["front_gmap_feats"] = jnp.zeros((B, 4, D))
    if c.obj_feat_size > 0:
        nkw["vp_obj_masks"] = jnp.zeros((B, L), bool)
    v_nav = model.init(
        r3,
        txt_embeds=jnp.zeros((B, Lt, D)), txt_masks=txt_masks,
        gmap_img_embeds=jnp.zeros((B, G, D)),
        gmap_step_ids=jnp.zeros((B, G), jnp.int32),
        gmap_pos_fts=jnp.zeros((B, G, c.angle_feat_size + 3)),
        gmap_masks=jnp.ones((B, G), bool),
        gmap_pair_dists=jnp.zeros((B, G, G)),
        gmap_visited_masks=jnp.zeros((B, G), bool),
        vp_img_embeds=jnp.zeros((B, L, D)),
        vp_pos_fts=jnp.zeros((B, L, 2 * (c.angle_feat_size + 3))),
        vp_masks=jnp.ones((B, L), bool),
        vp_nav_masks=jnp.ones((B, L), bool),
        local_to_gmap=jnp.full((B, L), -1, jnp.int32),
        method=GoatModel.forward_navigation, **nkw)

    params = _merge(jax.tree.map(lambda x: x, v_text["params"]),
                    _merge(v_pano["params"], v_nav["params"]))

    if c.mode == "extract_cfp_features":
        # the CFP-extraction path carries extra tim heads/self-encoders
        T, K, Gm = 2, max_cands, 8
        Lp = K + 36
        cfp_batch = dict(
            txt_ids=txt_ids, txt_masks=txt_masks,
            traj_view_img_fts=jnp.zeros((B, T, Lp, c.image_feat_size)),
            traj_loc_fts=jnp.zeros((B, T, Lp, c.angle_feat_size + 3)),
            traj_nav_types=jnp.zeros((B, T, Lp), jnp.int32),
            traj_view_masks=jnp.ones((B, T, Lp), bool),
            step_masks=jnp.ones((B, T), bool),
            traj_len=jnp.full((B,), T, jnp.int32),
            gmap_step_ids=jnp.zeros((B, Gm), jnp.int32),
            gmap_pos_fts=jnp.zeros((B, Gm, c.angle_feat_size + 3)),
            gmap_masks=jnp.ones((B, Gm), bool),
            gmap_pair_dists=jnp.zeros((B, Gm, Gm)),
            gmap_visited_step=jnp.full((B, Gm), -1, jnp.int32),
            cand_to_gmap=jnp.full((B, T, K), -1, jnp.int32),
            vp_pos_fts=jnp.zeros((B, 1 + Lp, 2 * (c.angle_feat_size + 3))),
        )
        v_cfp = model.init(jax.random.fold_in(rng, 9), cfp_batch,
                           method=GoatModel.extract_cfp)
        params = _merge(params, v_cfp["params"])
    return {"params": params}


def count_params(variables) -> int:
    return sum(x.size for x in jax.tree.leaves(variables))
