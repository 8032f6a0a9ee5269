"""Per-task pretrain step timing (ours): build one synthetic rig and time
each task's jitted train step at the same batch size, separating host
batch-build time from device step time.  Chases the CFP-vs-SAP throughput
gap (COVERAGE round-2: MLM 408 / SAP 423 / CFP 95 ex/s).

Usage: python scripts/profile_pretrain.py [--cpu] [--B 24] [--iters 6]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--B", type=int, default=24)
ap.add_argument("--iters", type=int, default=6)
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from vln_goat_tpu.pretrain.cli import build, parse_args
from vln_goat_tpu.pretrain.train import (PretrainState, init_pretrain_params,
                                         make_pretrain_optimizer,
                                         make_pretrain_steps)
from vln_goat_tpu.config import PretrainConfig

TASKS = ["mlm", "mrc", "sap", "og", "cfp"]


def main():
    pargs = parse_args(["--synthetic", "--dataset", "reverie",
                        "--tasks", *TASKS, "--max_steps_traj", "10"])
    rt = build(pargs)
    model, builder, items = rt["model"], rt["builder"], rt["items"]
    B = args.B

    rng = np.random.default_rng(0)
    pool = items["train"]

    def host_batch(task):
        chunk = [pool[i] for i in rng.integers(0, len(pool), B)]
        return builder.build_batch(chunk, task)

    batches = {t: jax.tree.map(jnp.asarray, host_batch(t)) for t in TASKS}
    params = init_pretrain_params(model, jax.random.PRNGKey(0), batches)
    pcfg = PretrainConfig(tasks=tuple(TASKS), mix_ratio=(1,) * len(TASKS),
                          train_batch_size=B)
    tx = make_pretrain_optimizer(pcfg)
    steps = make_pretrain_steps(model, tx, TASKS)
    state = PretrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    for t in TASKS:
        # host-side build time
        t0 = time.perf_counter()
        for _ in range(args.iters):
            host_batch(t)
        host_dt = (time.perf_counter() - t0) / args.iters

        state2, m = steps[t](state, batches[t], jax.random.PRNGKey(0))
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for i in range(args.iters):
            state2, m = steps[t](state2, batches[t],
                                 jax.random.PRNGKey(i))
        jax.block_until_ready(m["loss"])
        dev_dt = (time.perf_counter() - t0) / args.iters
        print(f"{t:4s}: host {host_dt*1e3:7.1f} ms/batch  "
              f"device {dev_dt*1e3:7.1f} ms/step  "
              f"-> {B/(host_dt+dev_dt):7.1f} ex/s pipelined-min "
              f"({B/dev_dt:7.1f} device-only)", flush=True)


if __name__ == "__main__":
    main()
