"""Full-scale R2R DAgger fine-tuning drive on the real TPU: one jitted
update = teacher rollout + sampled rollout + backward + AdamW (the
north-star throughput metric, BASELINE.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from vln_goat_tpu.config import GoatConfig
from vln_goat_tpu.models.goat import GoatModel
from vln_goat_tpu.rollout.env import EpisodeBatcher, make_synthetic_dataset
from vln_goat_tpu.rollout.rollout import NavRollout, RolloutConfig
from vln_goat_tpu.rollout.world import NavWorld
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
from vln_goat_tpu.train.params import init_goat_params
from vln_goat_tpu.train.trainer import (init_train_state, make_optimizer,
                                        make_train_step)


def main():
    B = int(os.environ.get("FT_BATCH", "12"))
    cfg = GoatConfig.for_dataset("r2r")
    rcfg = RolloutConfig(num_nodes=48, horizon=15, feat_dim=768)
    scans = [make_synthetic_scan(f"f{i}", num_vps=100, degree=4, seed=i)
             for i in range(3)]
    graphs = {g.scan_id: g for g in scans}
    world = NavWorld.build(scans, feat_dim=768, seed=0)
    model = GoatModel(cfg)
    t0 = time.time()
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                              num_nodes=48)
    print(f"init {time.time()-t0:.0f}s", flush=True)
    ro = NavRollout(model, world, rcfg)
    data = make_synthetic_dataset(graphs, 128, vocab_size=cfg.vocab_size,
                                  max_instr_len=60, path_len=(4, 7), seed=1)
    batcher = EpisodeBatcher(data, graphs, list(graphs), batch_size=B,
                             max_instr_len=60, max_gt_len=16)
    tx = make_optimizer(lr=2e-5, grad_clip=40.0)
    step_fn = jax.jit(make_train_step(ro, tx, train_alg="dagger",
                                      ml_weight=0.2))
    state = init_train_state(params, tx)
    _, batch = batcher.next_batch()
    t0 = time.time()
    state, m = step_fn(state, batch, jax.random.PRNGKey(0))
    jax.block_until_ready(m["loss"])
    print(f"dagger step compile+run {time.time()-t0:.0f}s "
          f"loss={float(m['loss']):.4f} gnorm={float(m['grad_norm']):.2f}",
          flush=True)
    for i in range(2):
        _, batch = batcher.next_batch()
        state, m = step_fn(state, batch, jax.random.PRNGKey(1 + i))
        jax.block_until_ready(m["loss"])
        print(f"step {i+1}: loss={float(m['loss']):.4f}", flush=True)
    iters = 10
    t0 = time.time()
    for i in range(iters):
        _, batch = batcher.next_batch()
        state, m = step_fn(state, batch, jax.random.PRNGKey(10 + i))
    jax.block_until_ready(m["loss"])
    dt = (time.time() - t0) / iters
    # DAgger = 2 rollouts (teacher + sample) per update => 2B episodes/step
    print(f"steady: {dt*1000:.0f} ms/update = {B/dt:.1f} updates-episodes/s "
          f"({2*B/dt:.1f} rollout-episodes/s incl teacher pass)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
