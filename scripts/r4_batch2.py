"""Round-4 on-chip batch 2: remat='model' (save bookkeeping primals,
recompute only transformer calls) x unroll, batch scaling at the best
known config (full/unroll=2), then a device profile of the winner.
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
    (64, "model", "1"),
    (64, "model", "2"),
    (64, "bounds", "2"),
    (96, "full", "2"),
    (128, "full", "2"),
]


def main():
    results = []
    for B, remat, unroll in CONFIGS:
        os.environ["GOAT_SCAN_UNROLL"] = unroll
        tag = f"B={B} remat={remat} unroll={unroll}"
        print(f"=== {tag} ===", flush=True)
        t0 = time.time()
        try:
            eps = BT.run(B, "dagger", remat, True, iters=8)
            results.append((tag, eps))
        except Exception as e:
            print(f"FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
            results.append((tag, None))
        gc.collect()
        print(f"  [config wall {time.time()-t0:.0f}s]", flush=True)
    print("=== summary ===", flush=True)
    for tag, eps in results:
        print(f"  {tag}: {eps if eps is None else round(eps, 1)}", flush=True)
    # profile the unroll=2 full config for the next optimization round
    os.environ["GOAT_SCAN_UNROLL"] = "2"
    print("=== profile full/unroll=2 ===", flush=True)
    import scripts.profile_step as PS
    try:
        PS.main(mode="train", B=64, outdir="/tmp/jaxprof_r4", remat="full")
    except Exception as e:
        print(f"profile FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    main()
