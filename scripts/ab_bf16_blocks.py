"""A/B the bf16-operand fused-block kernels against the XLA baseline in
ONE process (tunnel discipline: the axon grant is single-client).

Configs:
  1. XLA baseline (GOAT_PALLAS off)            -- cached compile
  2. fused attn+ffn blocks, bf16 dots (new)
  3. fused ffn only, bf16 dots
  4. fused attn only, bf16 dots
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
    ("xla-baseline", {"GOAT_PALLAS": "0"}),
    ("blocks-attn+ffn-bf16", {"GOAT_PALLAS": "1", "GOAT_PALLAS_BLOCK": "1",
                              "GOAT_PALLAS_FFN": "1"}),
    ("blocks-ffn-only-bf16", {"GOAT_PALLAS": "1", "GOAT_PALLAS_BLOCK": "0",
                              "GOAT_PALLAS_ATTN": "0",
                              "GOAT_PALLAS_FFN": "1"}),
    ("blocks-attn-only-bf16", {"GOAT_PALLAS": "1", "GOAT_PALLAS_BLOCK": "1",
                               "GOAT_PALLAS_FFN": "0"}),
]


def main():
    for name, env in CONFIGS:
        # reset all gates first — configs must not inherit the previous
        # config's env (the first run of this script leaked
        # GOAT_PALLAS_ATTN=0 into the attn-only config)
        for k in ("GOAT_PALLAS", "GOAT_PALLAS_BLOCK", "GOAT_PALLAS_ATTN",
                  "GOAT_PALLAS_FFN"):
            os.environ[k] = "1" if k != "GOAT_PALLAS" else "0"
        for k, v in env.items():
            os.environ[k] = v
        print(f"=== {name} ===", flush=True)
        t0 = time.time()
        try:
            BT.run(64, "dagger", "full", True, iters=8)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
        gc.collect()
        print(f"  [config wall {time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
