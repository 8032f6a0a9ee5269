"""Full-scale pretraining drive on the real TPU: compiles and runs all
tasks, reports losses/metrics and steady-state throughput.

Run as a single background process (the axon tunnel is single-client).
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

from vln_goat_tpu.config import GoatConfig, PretrainConfig
from vln_goat_tpu.pretrain.data import (PretrainShapes, TrajBatchBuilder,
                                        items_from_dataset)
from vln_goat_tpu.pretrain.model import GoatPretrainModel
from vln_goat_tpu.pretrain.train import (MetaTaskSampler, PretrainState,
                                         init_pretrain_params,
                                         make_pretrain_optimizer,
                                         make_pretrain_steps)
from vln_goat_tpu.rollout.env import make_synthetic_dataset
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan


def main():
    cfg = GoatConfig.for_dataset("r2r")
    TASKS = ("mlm", "sap", "cfp")
    scans = [make_synthetic_scan(f"p{i}", num_vps=60, seed=i) for i in range(2)]
    graphs = {g.scan_id: g for g in scans}
    vtot = sum(g.num_vps for g in scans)
    feats = np.random.default_rng(0).standard_normal(
        (vtot, 36, 768)).astype(np.float32)
    shapes = PretrainShapes(max_txt_len=60, max_steps=8, max_cands=16,
                            max_gmap=48, max_mlm=12, mrc_prob_dim=1000)
    builder = TrajBatchBuilder(graphs, list(graphs), feats, shapes, seed=0)
    data = make_synthetic_dataset(graphs, 48, vocab_size=50265,
                                  max_instr_len=48, path_len=(3, 6), seed=2)
    items = items_from_dataset(data, graphs)
    model = GoatPretrainModel(cfg, tasks=TASKS, image_prob_size=1000)
    B = 24
    batches = {t: jax.tree.map(jnp.asarray, builder.build_batch(items[:B], t))
               for t in TASKS}
    t0 = time.time()
    params = init_pretrain_params(model, jax.random.PRNGKey(0), batches)
    print("init %.0fs params=%.1fM" % (
        time.time() - t0, sum(x.size for x in jax.tree.leaves(params)) / 1e6),
        flush=True)
    tx = make_pretrain_optimizer(PretrainConfig())
    steps = make_pretrain_steps(model, tx, TASKS)
    state = PretrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    for i in range(3):
        for t in TASKS:
            tm0 = time.time()
            state, m = steps[t](state, batches[t], jax.random.PRNGKey(i))
            jax.block_until_ready(m["loss"])
            print(f"step {i} {t}: loss={float(m['loss']):.4f} "
                  + " ".join(f"{k}={float(v):.3f}" for k, v in m.items()
                             if k != "loss")
                  + f" ({time.time() - tm0:.1f}s)", flush=True)
    # steady-state throughput
    for t in TASKS:
        t0 = time.time()
        for i in range(3):
            state, m = steps[t](state, batches[t], jax.random.PRNGKey(90 + i))
        jax.block_until_ready(m["loss"])
        dt = (time.time() - t0) / 3
        print(f"{t}: {dt*1000:.0f} ms/step = {B/dt:.0f} ex/s", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
