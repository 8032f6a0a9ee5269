"""Round-3 on-chip batch 5, ONE process (tunnel discipline):
remat='model' — per-call checkpoints on the transformer forwards only,
so the backward never recomputes the episodic bookkeeping soup (the
profiled dominant cost: ~265k scalar-granular copy/slice ops per
iteration) — crossed with scan unroll, vs the 'full' baseline (97.6)
and full/unroll2 (99.5, batch 3).  remat='model' exists since round-3
session 2 (rollout.build_rollout) and is grad-parity tested
(tests/test_fused_dagger.py) but was never A/B'd on chip: the tunnel
outage hit first.
"""
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import scripts.bench_train as BT

CONFIGS = [
    # (B, remat, unroll)
    (64, "model", "1"),
    (64, "model", "2"),
    (128, "model", "1"),
]


def main():
    for B, remat, unroll in CONFIGS:
        os.environ["GOAT_SCAN_UNROLL"] = unroll
        print(f"=== B={B} remat={remat} unroll={unroll} ===", flush=True)
        t0 = time.time()
        try:
            BT.run(B, "dagger", remat, True, iters=8)
        except Exception as e:
            print(f"FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        gc.collect()
        print(f"  [config wall {time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
