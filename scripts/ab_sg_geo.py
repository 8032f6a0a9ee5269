"""Exactness assertion for the geometry-feature gradient boundary:
monkeypatches rollout._sg (identity seam) to lax.stop_gradient and asserts
d(loss)/d(params) is IDENTICAL either way — i.e. JAX's symbolic-zero
propagation already prunes the geometry VJP chains, so no stop_gradient
machinery is needed in the library (the r4 GOAT_SG_GEO flag was removed on
the strength of this invariant).  Also reports compiled-HLO size + (on
chip) step time for each setting.

Usage: JAX_PLATFORMS=cpu python scripts/ab_sg_geo.py        # exactness + HLO
       python scripts/ab_sg_geo.py --time                   # on-chip timing
"""
import os
import sys
import time

os.environ.setdefault("GOAT_SCAN_UNROLL", "2")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_default_prng_impl", os.environ.get("GOAT_PRNG", "rbg"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(B, tiny):
    sys.path.insert(0, "/root/repo")
    import bench
    from vln_goat_tpu.train import trainer as TR

    if tiny:
        # small rig for the CPU exactness check
        from vln_goat_tpu.config import GoatConfig
        from vln_goat_tpu.models.goat import GoatModel
        from vln_goat_tpu.rollout.env import (EpisodeBatcher,
                                              make_synthetic_dataset)
        from vln_goat_tpu.rollout.rollout import NavRollout, RolloutConfig
        from vln_goat_tpu.rollout.world import NavWorld
        from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
        from vln_goat_tpu.train.params import init_goat_params

        cfg = GoatConfig(num_l_layers=1, num_x_layers=1, num_pano_layers=1,
                         hidden_size=32, num_attention_heads=2,
                         intermediate_size=64, vocab_size=64,
                         max_position_embeddings=64, image_feat_size=16)
        scans = [make_synthetic_scan(f"s{i}", num_vps=40, degree=3, seed=i)
                 for i in range(2)]
        world = NavWorld.build(scans, feat_dim=cfg.image_feat_size, seed=0)
        rcfg = RolloutConfig(num_nodes=16, horizon=6,
                             feat_dim=cfg.image_feat_size)
        model = GoatModel(cfg, dtype=jnp.float32)
        params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=8,
                                  num_nodes=rcfg.num_nodes)
        ro = NavRollout(model, world, rcfg)
        graphs = {g.scan_id: g for g in scans}
        data = make_synthetic_dataset(graphs, 64, vocab_size=cfg.vocab_size,
                                      path_len=(3, 5), seed=1,
                                      max_instr_len=32)
        batcher = EpisodeBatcher(data, graphs, [g.scan_id for g in scans],
                                 batch_size=B, max_instr_len=32, max_gt_len=6)
    else:
        model, params, ro, batcher = bench.build(B)
    tx = TR.make_optimizer(lr=2e-5)
    state = TR.init_train_state(params, tx)
    step = jax.jit(TR.make_train_step(
        ro, tx, train_alg="dagger", ml_weight=0.2,
        remat=os.environ.get("GOAT_BENCH_REMAT", "model"),
        teacher_horizon=batcher.max_gt_len))
    _, batch = batcher.next_batch()
    return step, state, batch


def grads_of(B, tiny):
    import bench  # noqa: F401 — config side effects
    from vln_goat_tpu.train import trainer as TR

    step, state, batch = build_step(B, tiny)
    rng = jax.random.PRNGKey(7)
    new_state, m = step(state, batch, rng)
    jax.block_until_ready(m["loss"])
    return new_state.params, m, step, state, batch, rng


def main():
    timing = "--time" in sys.argv
    B = int(os.environ.get("GOAT_BENCH_TRAIN_B", "64" if timing else "8"))
    tiny = not timing
    from vln_goat_tpu.rollout import rollout as R

    results = {}
    for flag in ("0", "1"):
        R._sg = (lambda x: x) if flag == "0" else jax.lax.stop_gradient
        params, m, step, state, batch, rng = grads_of(B, tiny)
        lowered = step.lower(state, batch, rng).compile()
        hlo_lines = len(lowered.as_text().splitlines())
        row = dict(loss=float(m["loss"]), grad_norm=float(m["grad_norm"]),
                   hlo_lines=hlo_lines, params=params)
        if timing:
            st, mm = state, m
            for i in range(3):  # warm
                st, mm = step(st, batch, jax.random.fold_in(rng, i))
            jax.block_until_ready(mm["loss"])
            iters = 8
            t0 = time.perf_counter()
            for i in range(iters):
                st, mm = step(st, batch, jax.random.fold_in(rng, 100 + i))
            jax.block_until_ready(mm["loss"])
            float(mm["loss"])
            row["eps_s"] = B * iters / (time.perf_counter() - t0)
        results[flag] = row
        print(f"sg_geo={flag}: loss={row['loss']:.6f} "
              f"grad_norm={row['grad_norm']:.6f} hlo={hlo_lines}"
              + (f" eps/s={row['eps_s']:.1f}" if timing else ""), flush=True)

    a, b = results["0"]["params"], results["1"]["params"]
    diffs = jax.tree.map(lambda x, y: float(jnp.max(jnp.abs(x - y))), a, b)
    md = max(jax.tree.leaves(diffs)) if jax.tree.leaves(diffs) else 0.0
    print(f"max |param diff| after 1 step: {md:.3e}")
    assert abs(results["0"]["loss"] - results["1"]["loss"]) < 1e-6
    if not timing:
        assert md < 1e-6, "gradients must be identical"
        print("EXACT: losses and updated params identical")


if __name__ == "__main__":
    main()
