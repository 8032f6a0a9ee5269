"""Round-5 A/B: bf16 scan carries vs the same-session control — RAN
2026-08-20 (ROADMAP round-5 carry table): control 104.2, carry 105.2
(+1%, within the control spread), carry+bucket 114.6 == bucket alone,
control repeat 104.7.  The GOAT_BF16_CARRY flag was PRUNED from
rollout.py afterward (promote-or-prune), so the carry rows below now
measure the identical f32-carry graph; the script is kept as the
record of the experiment's harness.

Every config runs in its own subprocess (env leakage lesson); a repeated
control row exposes within-session drift.
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CONFIGS = [
    # (tag, bucket, bf16_carry, iters)
    ("control", "", "0", 16),
    ("bf16 carry", "", "1", 16),
    ("bf16 carry + bucket 5,8", "5,8", "1", 24),
    ("control (repeat)", "", "0", 16),
]

results = {}
for tag, bucket, carry, iters in CONFIGS:
    print(f"=== {tag} ===", flush=True)
    env = dict(os.environ, GOAT_SCAN_UNROLL="2", GOAT_BUCKET=bucket,
               GOAT_BF16_CARRY=carry, GOAT_PRNG="rbg")
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench_train.py"),
         "--alg", "dagger", "--B", "64", "--remat", "model",
         "--iters", str(iters)],
        env=env, capture_output=True, text=True, timeout=5400)
    out = p.stdout.strip().splitlines()
    print("\n".join(out[-2:]) if out else f"FAILED rc={p.returncode}",
          flush=True)
    if p.returncode != 0:
        print("\n".join(p.stderr.strip().splitlines()[-30:]), flush=True)
        results[tag] = None
        continue
    for line in out:
        if "eps/s=" in line:
            results[tag] = float(line.split("eps/s=")[1].split()[0])
print("=== summary ===", flush=True)
for k, v in results.items():
    print(f"  {k}: {v}", flush=True)
