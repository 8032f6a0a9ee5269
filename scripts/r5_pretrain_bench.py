"""Round-5: publish the END-TO-END pretrain steady state (VERDICT r4
item 3) — the real multi-process batch stream (BatchWorkerPool, shm
feature tables) feeding each task's jitted train step on the chip, at
the reference recipe batch (48, r2r_GOAT_pretrain.json:7).

Prints one JSON line per task (ex/s + vs the reference's zero-compute
GPU ceiling, BASELINE.md round-3 table) plus a host-topology note:
this host exposes ONE CPU core, so the pool can only pipeline into
device-step waits — worker count is scaled to the host, not the r4
default of 6.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets jax cache/prng config at import)

CEIL = bench.REF_PRETRAIN


def main():
    ncpu = len(os.sched_getaffinity(0))
    print(json.dumps({"host_cpus": ncpu}), flush=True)
    t0 = time.perf_counter()
    out = bench.bench_pretrain()  # num_workers scales to the host
    for t, eps in out.items():
        print(json.dumps({
            "metric": f"pretrain_{t}_examples_per_sec_end_to_end",
            "value": round(eps, 1), "unit": "examples/s",
            "vs_baseline": round(eps / CEIL[t], 2),
            "note": "includes host batch building (worker pool); baseline"
                    " = reference zero-compute GPU ceiling",
        }), flush=True)
    print(json.dumps({"total_s": round(time.perf_counter() - t0, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
