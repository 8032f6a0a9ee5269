"""Measure MFU of the DAgger train step on the real chip.

MFU = (XLA cost_analysis FLOPs of the jitted step) / step_time / chip peak.
Two numbers are printed:
- hw_flops_util: uses the compiled executable's own flop count (includes
  remat recompute — i.e. how busy the MXU actually is);
- model_mfu: uses the no-remat ('none') lowering's flop count as the
  "useful model flops" numerator over the SAME measured step time (the
  conventional MFU definition: recompute is overhead, not useful work).

Peak: TPU v5e (v5 lite) bf16 peak = 197 TFLOP/s per chip.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl",
                  os.environ.get("GOAT_PRNG", "rbg"))
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

PEAK_BF16 = 197e12  # TPU v5e per-chip bf16 peak FLOP/s


def flops_of(fn, *args):
    lowered = jax.jit(fn).lower(*args)
    try:
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception as e:
        print("cost_analysis failed:", e)
        return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--alg", default="dagger")
    ap.add_argument("--remat", default="full")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    sys.argv = [sys.argv[0]]

    import scripts.bench_train as BT
    from vln_goat_tpu.train import trainer as TR
    from vln_goat_tpu.train.trainer import fuse_dagger_batches

    step, state, batcher = BT.build(args.B, args.alg, args.remat, True)

    def nb():
        if args.alg == "dagger_fused":
            _, b1 = batcher.next_batch()
            _, b2 = batcher.next_batch()
            return fuse_dagger_batches(b1, b2)
        return batcher.next_batch()[1]

    rng = jax.random.PRNGKey(0)
    batch = nb()
    state, m = step(state, batch, rng)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for i in range(args.iters):
        state, m = step(state, nb(), jax.random.fold_in(rng, i))
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / args.iters
    eps = args.B / dt

    # flop counts: as-compiled (with remat) and useful-model (remat none)
    hw_flops = flops_of(lambda s, b, r: step.__wrapped__(s, b, r)
                        if hasattr(step, "__wrapped__") else step(s, b, r),
                        state, batch, rng)
    # build a no-remat twin for the useful-flops numerator; lower only
    # (no execution — 'none' OOMs at production batch)
    step_none, state_n, batcher_n = BT.build(args.B, args.alg, "none", True)
    model_flops = flops_of(step_none, state_n, batch, rng)

    print(f"B={args.B} alg={args.alg} remat={args.remat}")
    print(f"step_time_s={dt:.4f} eps/s={eps:.2f}")
    print(f"hw_flops/step={hw_flops/1e12:.3f} TF  "
          f"hw_flops_util={hw_flops/dt/PEAK_BF16*100:.1f}%")
    print(f"model_flops/step={model_flops/1e12:.3f} TF  "
          f"model_mfu={model_flops/dt/PEAK_BF16*100:.1f}%")


if __name__ == "__main__":
    main()
