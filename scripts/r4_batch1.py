"""Round-4 on-chip batch 1, ONE process (tunnel discipline).

Runs the A/Bs the round-3 tunnel outage blocked (VERDICT r4 item 1):
remat 'probs'/'wide' x GOAT_SCAN_UNROLL, plus an onehot-vs-scatter check
now that every one-hot einsum runs at Precision.HIGHEST (ADVICE r3 fix —
HIGHEST f32 contractions are multi-pass on the MXU, so the onehot win
must be re-validated on chip).
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
    # (B, remat, unroll, onehot)
    (64, "full", "1", "1"),    # baseline re-anchor (post-HIGHEST esum)
    (64, "full", "1", "0"),    # scatter path: does HIGHEST flip the A/B?
    (64, "probs", "1", "1"),
    (64, "probs", "2", "1"),
    (64, "full", "2", "1"),
    (64, "wide", "1", "1"),
    (128, "probs", "1", "1"),
]


def main():
    results = []
    for B, remat, unroll, onehot in CONFIGS:
        os.environ["GOAT_SCAN_UNROLL"] = unroll
        os.environ["GOAT_ONEHOT"] = onehot
        tag = f"B={B} remat={remat} unroll={unroll} onehot={onehot}"
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
    os.environ.pop("GOAT_SCAN_UNROLL", None)
    os.environ.pop("GOAT_ONEHOT", None)
    print("=== summary ===", flush=True)
    for tag, eps in results:
        print(f"  {tag}: {eps if eps is None else round(eps, 1)}", flush=True)


if __name__ == "__main__":
    main()
