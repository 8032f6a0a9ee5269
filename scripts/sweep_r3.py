"""Round-3 perf sweep: run several train-step configs in ONE process (the
axon tunnel is single-client; one long-lived process avoids grant churn),
with per-config exception guards so an OOM config doesn't kill the sweep.
"""
import gc
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl",
                  os.environ.get("GOAT_PRNG", "rbg"))
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import scripts.bench_train as BT

CONFIGS = [
    # (B, alg, remat)
    (64, "dagger", "full"),        # round-2 production config (baseline)
    (96, "dagger", "full"),
    (128, "dagger", "full"),
    (64, "dagger_fused", "full"),
    (64, "dagger", "bounds"),
    (128, "dagger", "bounds"),
]


def main():
    for B, alg, remat in CONFIGS:
        t0 = time.time()
        try:
            BT.run(B, alg, remat, True, iters=8)
        except Exception as e:
            print(f"alg={alg} B={B} remat={remat} FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        gc.collect()
        print(f"  [config wall {time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
