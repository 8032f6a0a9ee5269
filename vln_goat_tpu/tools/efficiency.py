"""Model cost accounting: parameters + FLOPs per forward mode.

Reference: map_nav_src/utils/efficiency_count.py (thop.profile at bs 8,
txt 44, views 36, gmap 6, :120-138).  TPU-native: XLA's own cost analysis
(`jax.jit(...).lower(...).compile().cost_analysis()`) replaces thop — it
reports the flops of the exact compiled program.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import GoatConfig
from ..models.goat import GoatModel
from ..train.params import count_params, init_goat_params


def canonical_inputs(cfg: GoatConfig, bs: int = 8, txt_len: int = 44,
                     views: int = 36, gmap: int = 6):
    D = cfg.hidden_size
    lang = dict(txt_ids=jnp.zeros((bs, txt_len), jnp.int32),
                txt_masks=jnp.ones((bs, txt_len), bool))
    pano = dict(view_img_fts=jnp.zeros((bs, views, cfg.image_feat_size)),
                loc_fts=jnp.zeros((bs, views, cfg.angle_feat_size + 3)),
                nav_types=jnp.zeros((bs, views), jnp.int32),
                view_masks=jnp.ones((bs, views), bool))
    L = views + 2
    nav = dict(
        txt_embeds=jnp.zeros((bs, txt_len, D)),
        txt_masks=lang["txt_masks"],
        gmap_img_embeds=jnp.zeros((bs, gmap, D)),
        gmap_step_ids=jnp.zeros((bs, gmap), jnp.int32),
        gmap_pos_fts=jnp.zeros((bs, gmap, cfg.angle_feat_size + 3)),
        gmap_masks=jnp.ones((bs, gmap), bool),
        gmap_pair_dists=jnp.zeros((bs, gmap, gmap)),
        gmap_visited_masks=jnp.zeros((bs, gmap), bool),
        vp_img_embeds=jnp.zeros((bs, L, D)),
        vp_pos_fts=jnp.zeros((bs, L, 2 * (cfg.angle_feat_size + 3))),
        vp_masks=jnp.ones((bs, L), bool),
        vp_nav_masks=jnp.ones((bs, L), bool),
        local_to_gmap=jnp.full((bs, L), -1, jnp.int32),
    )
    return lang, pano, nav


def efficiency_count(cfg: GoatConfig = None, bs: int = 8,
                     txt_len: int = 44) -> Dict[str, float]:
    """-> {params_m, language_gflops, panorama_gflops, navigation_gflops}."""
    cfg = cfg or GoatConfig.for_dataset("r2r")
    model = GoatModel(cfg)
    params = init_goat_params(model, jax.random.PRNGKey(0))
    out = {"params_m": count_params(params) / 1e6}

    lang, pano, nav = canonical_inputs(cfg, bs=bs, txt_len=txt_len)

    def flops(method, kwargs):
        fn = jax.jit(lambda p, kw: model.apply(p, **kw, method=method))
        ca = fn.lower(params, kwargs).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) / 1e9

    out["language_gflops"] = flops(GoatModel.forward_text, lang)
    out["panorama_gflops"] = flops(GoatModel.forward_panorama, pano)
    out["navigation_gflops"] = flops(GoatModel.forward_navigation, nav)
    return out


if __name__ == "__main__":
    import json

    print(json.dumps(efficiency_count(), indent=2))
