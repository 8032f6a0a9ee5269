"""Round-3 on-chip batch 4, ONE process (tunnel discipline):
the remat='wide' policy (probs + saved 4x-wide FFN tensors — backward
skips the erf-gelu recompute on the widest tensors in the model) crossed
with scan unroll, vs whatever batch 3 crowned.  Run AFTER r3_batch3.py.
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
    (64, "wide", "1"),
    (64, "wide", "2"),
    (64, "probs", "4"),
    (128, "wide", "1"),
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
