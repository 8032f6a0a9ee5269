"""Round-3 on-chip batch 3, ONE process (tunnel discipline):
the remat='probs' policy (saved softmax outputs + dropout masks) crossed
with scan unroll, vs the 'full' baseline.
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
    (64, "full", "1"),     # baseline re-anchor (cached after batch 2)
    (64, "probs", "1"),
    (64, "probs", "2"),
    (64, "full", "2"),
    (128, "probs", "1"),
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
    # warm the persistent compile cache with bench.py's exact graphs so
    # the driver's round-end bench compiles nothing
    os.environ.pop("GOAT_SCAN_UNROLL", None)
    print("=== bench.py warm ===", flush=True)
    import bench
    try:
        bench.main()
    except Exception as e:
        print(f"bench warm FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    main()
