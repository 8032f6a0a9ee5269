"""Round-4 batch 4: active-episode compaction A/B on chip.
GOAT_COMPACT gathers still-active episodes into a prefix at the given
step boundaries and runs the remaining sample-scan chunks at B/d."""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CONFIGS = [
    # (remat, unroll, B, compact)
    ("model", "2", 64, "6:2,10:4"),
    ("model", "2", 64, "4:2,8:4"),
    ("model", "2", 64, "4:2,7:4,10:8"),
]

results = {}
for remat, unroll, B, compact in CONFIGS:
    tag = f"B={B} remat={remat} unroll={unroll} compact={compact}"
    print(f"=== {tag} ===", flush=True)
    env = dict(os.environ, GOAT_SCAN_UNROLL=unroll, GOAT_COMPACT=compact)
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench_train.py"),
         "--alg", "dagger", "--B", str(B), "--remat", remat],
        env=env, capture_output=True, text=True, timeout=3600)
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
