"""Dump the OPTIMIZED TPU HLO of the DAgger train step (the bench.py
headline config) so fusion/layout pathologies seen in profiles can be
diagnosed offline.  Writes to --out (default /tmp/hlo_r4); disables the
persistent compile cache so XLA actually compiles and dumps.

Usage: GOAT_SCAN_UNROLL=2 python scripts/dump_hlo.py --remat model
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("--B", type=int, default=64)
ap.add_argument("--remat", default="model")
ap.add_argument("--out", default="/tmp/hlo_r4")
ap.add_argument("--run", type=int, default=0,
                help="also time N iterations after compiling")
a = ap.parse_args()

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_dump_to={a.out}"
                           + " --xla_dump_hlo_as_text"
                           + " --xla_dump_hlo_pass_re=NONE")

import jax

jax.config.update("jax_default_prng_impl",
                  os.environ.get("GOAT_PRNG", "rbg"))

import time

from vln_goat_tpu.train import trainer as TR

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("GOAT_SCAN_UNROLL", "2")
import importlib

bench = importlib.import_module("bench")

_, params, ro, batcher = bench.build(a.B)
tx = TR.make_optimizer(lr=2e-5)
state = TR.init_train_state(params, tx)
step = jax.jit(TR.make_train_step(
    ro, tx, train_alg="dagger", ml_weight=0.2, remat=a.remat,
    vectorized_teacher=True, teacher_horizon=batcher.max_gt_len))
_, batch = batcher.next_batch()
t0 = time.perf_counter()
lowered = step.lower(state, batch, jax.random.PRNGKey(0))
compiled = lowered.compile()
print(f"compiled in {time.perf_counter() - t0:.0f}s; dump at {a.out}",
      flush=True)
print(compiled.memory_analysis(), flush=True)
try:
    os.makedirs(a.out, exist_ok=True)
    txt = compiled.as_text()
    with open(os.path.join(a.out, "train_step.optimized.txt"), "w") as f:
        f.write(txt)
    print(f"as_text: {len(txt)/1e6:.1f} MB written", flush=True)
except Exception as e:  # noqa: BLE001 — tunnel backends may not support it
    print("as_text failed:", e, flush=True)
if a.run:
    state, m = compiled(state, batch, jax.random.PRNGKey(0))
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for i in range(a.run):
        _, batch = batcher.next_batch()
        state, m = compiled(state, batch, jax.random.fold_in(
            jax.random.PRNGKey(1), i))
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / a.run
    print(f"step {dt*1e3:.1f} ms  eps/s {a.B/dt:.1f}  loss {float(m['loss']):.3f}",
          flush=True)
