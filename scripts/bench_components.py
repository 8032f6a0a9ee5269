"""Component-level timing on the real chip: standalone jitted
forward_text / forward_panorama / forward_navigation at rollout shapes,
plus a bookkeeping-only rollout (model calls stubbed to cheap linears is
impractical; instead we time the full decode rollout and subtract).

Answers: is the scan dominated by model FLOPs or by graph/bookkeeping?
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(B=128, bf16=True):
    from vln_goat_tpu.config import GoatConfig
    from vln_goat_tpu.models.goat import GoatModel
    from vln_goat_tpu.train.params import init_goat_params

    cfg = GoatConfig.for_dataset(
        "r2r",
        use_pallas_attention=os.environ.get("GOAT_PALLAS", "0") == "1")
    dt = jnp.bfloat16 if bf16 else jnp.float32
    model = GoatModel(cfg, dtype=dt)
    N, K, L, nv = 48, 16, 60, 36
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=K,
                              num_nodes=N)
    rng = jax.random.PRNGKey(1)
    D = 768

    txt_ids = jnp.zeros((B, L), jnp.int32)
    txt_masks = jnp.ones((B, L), bool)
    f_text = jax.jit(lambda p: model.apply(
        p, txt_ids, txt_masks, method=GoatModel.forward_text))
    t_text = timeit(f_text, params)
    txt_embeds = f_text(params)

    pano_img = jnp.ones((B, K + nv, D), dt)
    pano_loc = jnp.ones((B, K + nv, cfg.angle_feat_size + 3), dt)
    nav_types = jnp.concatenate([jnp.ones((B, K), jnp.int32),
                                 jnp.zeros((B, nv), jnp.int32)], 1)
    pano_mask = jnp.ones((B, K + nv), bool)
    f_pano = jax.jit(lambda p: model.apply(
        p, pano_img, pano_loc, nav_types, pano_mask,
        method=GoatModel.forward_panorama))
    t_pano = timeit(f_pano, params)
    pano_embeds, _, _ = f_pano(params)

    # navigation inputs at rollout shapes
    N1 = N + 1
    gmap_embeds = jnp.ones((B, N1 + 1, D), dt)       # [stop | nodes]
    gmap_step = jnp.zeros((B, N1 + 1), jnp.int32)
    gmap_pos = jnp.ones((B, N1 + 1, 7), dt)
    gmap_masks = jnp.ones((B, N1 + 1), bool)
    gmap_pair = jnp.ones((B, N1 + 1, N1 + 1), dt)
    gmap_vis = jnp.zeros((B, N1 + 1), bool)
    local_embeds = jnp.ones((B, K + 2, D), dt)
    local_masks = jnp.ones((B, K + 2), bool)
    local_pos = jnp.ones((B, K + 2, 14), dt)
    l2g = jnp.zeros((B, K + 2), jnp.int32)
    import inspect

    sig = inspect.signature(GoatModel.forward_navigation)
    print("forward_navigation params:", list(sig.parameters)[:14],
          flush=True)
    kw = dict(gmap_img_embeds=gmap_embeds, gmap_step_ids=gmap_step,
              gmap_pos_fts=gmap_pos, gmap_masks=gmap_masks,
              gmap_pair_dists=gmap_pair, gmap_visited_masks=gmap_vis,
              vp_img_embeds=local_embeds, vp_masks=local_masks,
              vp_nav_masks=local_masks, vp_pos_fts=local_pos,
              local_to_gmap=l2g)
    ok = {k: v for k, v in kw.items() if k in sig.parameters}
    f_nav = jax.jit(lambda p: model.apply(
        p, txt_embeds, txt_masks, method=GoatModel.forward_navigation,
        **ok))
    t_nav = timeit(f_nav, params)

    print(f"B={B} bf16={int(bf16)}")
    print(f"forward_text       {t_text*1e3:8.2f} ms   (once per rollout)")
    print(f"forward_panorama   {t_pano*1e3:8.2f} ms   (x15 steps)")
    print(f"forward_navigation {t_nav*1e3:8.2f} ms   (x15 steps)")
    per_ro = t_text + 15 * (t_pano + t_nav)
    print(f"model-only rollout estimate {per_ro*1e3:8.1f} ms "
          f"-> {B/per_ro:7.1f} eps/s ceiling", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=128)
    ap.add_argument("--fp32", action="store_true")
    a = ap.parse_args()
    main(a.B, not a.fp32)
