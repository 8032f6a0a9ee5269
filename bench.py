"""Rollout throughput benchmark: R2R-scale greedy decode, episodes/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (the reference repo publishes no throughput numbers —
BASELINE.md): the reference R2R recipe runs 150k iterations at batch 12 on
one GPU (map_nav_src/scripts/run_r2r_goat.sh). DUET-architecture fine-tuning
of this size is reported/observed around 2 it/s on a modern GPU, i.e.
~24 episodes/s for the rollout loop with its per-step host<->device and
C++ sim round-trips. We use REF_EPISODES_PER_SEC = 24.0 as the provisional
anchor until the reference can be re-benchmarked on its own hardware.
"""
import json
import sys
import time

import jax
import numpy as np

# persistent compile cache: the rollout graph is large, recompiles are free
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


REF_EPISODES_PER_SEC = 24.0


def main():
    import os

    import jax.numpy as jnp

    from vln_goat_tpu.config import GoatConfig
    from vln_goat_tpu.models.goat import GoatModel
    from vln_goat_tpu.rollout.env import EpisodeBatcher, make_synthetic_dataset
    from vln_goat_tpu.rollout.rollout import NavRollout, RolloutConfig
    from vln_goat_tpu.rollout.world import NavWorld
    from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
    from vln_goat_tpu.train.params import init_goat_params

    # batch sweep on v5e: 474 eps/s @32, 596 @128, 577 @256 -> default 128
    B = int(os.environ.get("GOAT_BENCH_B", "128"))
    # NOTE use_pallas_attention stays off: the fused kernel wins 1.3-2.1x in
    # isolation on v5e, but inside the full rollout the pallas call boundary
    # blocks XLA from fusing the q/k/v projections and layout changes into
    # the attention, netting 334 vs 474 eps/s. Revisit with qkv folded into
    # the kernel.
    cfg = GoatConfig.for_dataset("r2r")
    rcfg = RolloutConfig(num_nodes=48, horizon=15, feat_dim=768)
    # Matterport-like scale: 4 scans x 120 viewpoints
    scans = [make_synthetic_scan(f"s{i}", num_vps=120, degree=4, seed=i)
             for i in range(4)]
    import os
    bf16 = os.environ.get("GOAT_BF16", "1") == "1"
    world = NavWorld.build(scans, feat_dim=768, seed=0)
    model = GoatModel(cfg, dtype=jnp.bfloat16 if bf16 else jnp.float32)
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                              num_nodes=rcfg.num_nodes)
    ro = NavRollout(model, world, rcfg)
    graphs = {g.scan_id: g for g in scans}
    data = make_synthetic_dataset(graphs, 256, vocab_size=cfg.vocab_size,
                                  path_len=(4, 7), seed=1)
    batcher = EpisodeBatcher(data, graphs, [g.scan_id for g in scans],
                             batch_size=B, max_instr_len=60, max_gt_len=16)

    fn = ro.jitted(feedback="argmax", train_ml=False)
    _, batch = batcher.next_batch()
    rng = jax.random.PRNGKey(0)

    # compile + warmup
    out = fn(params, batch, rng)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        _, batch = batcher.next_batch()
        out = fn(params, batch, jax.random.fold_in(rng, i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    eps = B * iters / dt
    print(json.dumps({
        "metric": "r2r_rollout_episodes_per_sec_per_chip",
        "value": round(eps, 2),
        "unit": "episodes/s",
        "vs_baseline": round(eps / REF_EPISODES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
