"""Round-4 batch 7: gt-length-bucketed batches (teacher scan at the bucket
cap) and the two-pass DAgger variant vs the same-session control, with a
repeated control row to expose within-session drift.

Every config runs in its own subprocess (env leakage lesson, r3 batch
scripts); iters raised for bucketed rows so the bucket mix averages out.
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

# 2pass rows ran 2026-08-20 (same-session control 104.7 eps/s): dagger_2pass
# measured 0.9 eps/s bare / 1.2 with bucket 5,8 — pruned from the codebase
# per the promote-or-prune rule (ROADMAP round-5 A/B table); the rows are
# removed so this script stays runnable.
CONFIGS = [
    # (tag, alg, bucket, sg_geo, iters)
    ("control", "dagger", "", "0", 16),
    ("bucket 5,8", "dagger", "5,8", "0", 24),
    ("bucket 4,6,8", "dagger", "4,6,8", "0", 24),
    ("control (repeat)", "dagger", "", "0", 16),
]

results = {}
for tag, alg, bucket, sg, iters in CONFIGS:
    print(f"=== {tag} ===", flush=True)
    env = dict(os.environ, GOAT_SCAN_UNROLL="2", GOAT_BUCKET=bucket,
               GOAT_PRNG="rbg")
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench_train.py"),
         "--alg", alg, "--B", "64", "--remat", "model",
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
