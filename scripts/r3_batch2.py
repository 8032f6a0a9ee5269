"""Round-3 on-chip batch 2, ONE process (tunnel discipline):
1. baseline re-check (cached compile) — confirms the tunnel is healthy;
2. xplane profile of the production config (rbg PRNG), top ops printed;
3. scan-unroll sweep (GOAT_SCAN_UNROLL=2,3 at B=64; B=128 u1).
"""
import gc
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import scripts.bench_train as BT


def profile(outdir="/tmp/jaxprof_b2"):
    step, state, batcher = BT.build(64, "dagger", "full", True)
    rng = jax.random.PRNGKey(0)
    batch = batcher.next_batch()[1]
    state, m = step(state, batch, rng)
    jax.block_until_ready(m["loss"])
    jax.profiler.start_trace(outdir)
    for i in range(2):
        state, m = step(state, batcher.next_batch()[1],
                        jax.random.fold_in(rng, i))
    jax.block_until_ready(m["loss"])
    jax.profiler.stop_trace()
    files = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                      recursive=True)
    files.sort(key=os.path.getmtime)
    print("xplane files:", files[-1:] if files else "NONE", flush=True)
    if not files:
        return
    from jax._src.profiler import ProfileData
    with open(files[-1], "rb") as f:
        data = ProfileData.from_serialized_xspace(f.read())
    for plane in data.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        print("PLANE:", plane.name, flush=True)
        tot = defaultdict(float)
        cnt = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                tot[ev.name] += ev.duration_ns
                cnt[ev.name] += 1
        top = sorted(tot.items(), key=lambda kv: -kv[1])[:45]
        s = sum(tot.values())
        print(f"  total event time {s/1e6:.1f} ms over "
              f"{sum(cnt.values())} events", flush=True)
        for name, ns in top:
            print(f"  {ns/1e6:9.2f} ms  x{cnt[name]:5d}  {name[:110]}",
                  flush=True)


def main():
    print("=== baseline recheck ===", flush=True)
    BT.run(64, "dagger", "full", True, iters=8)
    gc.collect()
    print("=== profile (rbg, cached) ===", flush=True)
    profile()
    gc.collect()
    for B, unroll in [(64, "2"), (64, "3"), (128, "1")]:
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
