"""Capture a device profile of the DAgger train step (or decode rollout)
and print the top ops by self time, using jax.profiler + ProfileData —
no tensorboard needed."""
import argparse
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# match the production config (bench.py/cli default): rbg dropout PRNG
jax.config.update("jax_default_prng_impl",
                  os.environ.get("GOAT_PRNG", "rbg"))
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main(mode="train", B=64, outdir="/tmp/jaxprof", remat="full"):
    sys.argv = [sys.argv[0]]
    import scripts.bench_train as BT
    from vln_goat_tpu.train.trainer import fuse_dagger_batches

    step, state, batcher = BT.build(B, "dagger", remat, True)
    rng = jax.random.PRNGKey(0)
    batch = batcher.next_batch()[1]
    state, m = step(state, batch, rng)  # compile
    jax.block_until_ready(m["loss"])
    jax.profiler.start_trace(outdir)
    for i in range(2):
        state, m = step(state, batcher.next_batch()[1],
                        jax.random.fold_in(rng, i))
    jax.block_until_ready(m["loss"])
    jax.profiler.stop_trace()

    # parse
    files = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                      recursive=True)
    files.sort(key=os.path.getmtime)
    print("xplane files:", files[-1:] if files else "NONE")
    if not files:
        return
    from jax._src.profiler import ProfileData
    with open(files[-1], "rb") as f:
        data = ProfileData.from_serialized_xspace(f.read())
    for plane in data.planes:
        print("PLANE:", plane.name)
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        tot = defaultdict(float)
        cnt = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns
                name = ev.name
                tot[name] += dur
                cnt[name] += 1
        top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
        s = sum(tot.values())
        print(f"  total event time {s/1e6:.1f} ms over {sum(cnt.values())} events")
        for name, ns in top:
            print(f"  {ns/1e6:9.2f} ms  x{cnt[name]:5d}  {name[:110]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="train")
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--remat", default="full")
    a = ap.parse_args()
    main(a.mode, a.B, remat=a.remat)
