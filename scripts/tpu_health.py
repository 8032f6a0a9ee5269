"""TPU tunnel health probe: exits 0 iff the chip answers AND per-RPC
latency is sane.  The axon relay has two failure modes (observed r3/r4):
dead (clients hang / UNAVAILABLE) and DEGRADED — every RPC round-trip
takes ~1s+, so step timings measure dispatch latency instead of compute
(2026-08-19: 50 chained 2048^2 matmuls + fetch = 48s vs <0.5s healthy;
2026-08-20: 10 chained 1024^2 matmuls + fetch = 460s).  Timing A/Bs are
meaningless in the degraded state; scripts should gate on this probe
(scripts/tpu_watch.sh passes --latency; bench.py runs it as a
deadline-bounded subprocess via --json).

Probe cost is bounded even when the tunnel is very slow: ONE timed
matmul+fetch runs first, and if that single RPC already exceeds the
budget the probe declares DEGRADED without issuing the other nine."""
import json
import sys
import time


def main():
    budget = float(sys.argv[sys.argv.index("--budget") + 1]) \
        if "--budget" in sys.argv else 3.0
    as_json = "--json" in sys.argv
    import jax
    import jax.numpy as jnp
    x = jnp.ones((1024, 1024), jnp.bfloat16)
    f = jax.jit(lambda a: a @ a)
    r = f(x)
    jax.block_until_ready(r)  # compile + first exec excluded from timing

    # single-RPC pre-check: in the severe degraded mode one round-trip is
    # ~46s — don't pay for ten of them just to learn the tunnel is sick
    t0 = time.perf_counter()
    r = f(r)
    float(jnp.sum(r.astype(jnp.float32)))
    one = time.perf_counter() - t0
    if one > budget:
        dt, n = one, 1
    else:
        t0 = time.perf_counter()
        for _ in range(10):
            r = f(r)
        float(jnp.sum(r.astype(jnp.float32)))  # fetch guard
        dt, n = time.perf_counter() - t0, 10
    healthy = n == 10 and dt < budget
    if as_json:
        print(json.dumps({"seconds": round(dt, 2), "n_matmuls": n,
                          "healthy": healthy, "budget_s": budget}),
              flush=True)
    else:
        print(f"{n} chained matmuls + fetch: {dt:.2f}s "
              f"({'HEALTHY' if healthy else 'DEGRADED'}, budget {budget}s)",
              flush=True)
    sys.exit(0 if healthy else 1)


if __name__ == "__main__":
    main()
