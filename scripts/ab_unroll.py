"""A/B scan-unroll factors on the DAgger step (GOAT_SCAN_UNROLL).
Unrolling lets the XLA scheduler overlap adjacent steps' gathers with
compute — the profiled step is data-movement bound, so this is the
matching lever.  One process (tunnel discipline)."""
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


CONFIGS = [(64, "2"), (64, "3"), (128, "1"), (128, "2")]


def main():
    for B, unroll in CONFIGS:
        os.environ["GOAT_SCAN_UNROLL"] = unroll
        print(f"=== B={B} unroll={unroll} ===", flush=True)
        t0 = time.time()
        try:
            BT.run(B, "dagger", "full", True, iters=8)
        except Exception as e:
            print(f"B={B} unroll={unroll} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
        gc.collect()
        print(f"  [config wall {time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
