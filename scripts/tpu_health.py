"""TPU tunnel health probe: exits 0 iff the chip answers AND per-RPC
latency is sane.  The axon relay has two failure modes (observed r3/r4):
dead (clients hang / UNAVAILABLE) and DEGRADED — every RPC round-trip
takes ~1s, so step timings measure dispatch latency instead of compute
(2026-08-19: 50 chained 2048^2 matmuls + fetch = 48s vs <0.5s healthy).
Timing A/Bs are meaningless in the degraded state; scripts should gate on
this probe (scripts/tpu_watch.sh passes --latency)."""
import sys
import time


def main():
    budget = float(sys.argv[sys.argv.index("--budget") + 1]) \
        if "--budget" in sys.argv else 3.0
    import jax
    import jax.numpy as jnp
    x = jnp.ones((1024, 1024), jnp.bfloat16)
    f = jax.jit(lambda a: a @ a)
    r = f(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(10):
        r = f(r)
    float(jnp.sum(r.astype(jnp.float32)))  # fetch guard
    dt = time.perf_counter() - t0
    healthy = dt < budget
    print(f"10 chained matmuls + fetch: {dt:.2f}s "
          f"({'HEALTHY' if healthy else 'DEGRADED'}, budget {budget}s)")
    sys.exit(0 if healthy else 1)


if __name__ == "__main__":
    main()
