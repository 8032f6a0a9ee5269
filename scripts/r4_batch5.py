"""Round-4 batch 5: compaction x remat=full (tiny per-chunk residuals,
unlike 'model' whose cond-joined bookkeeping primals ate the win)."""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CONFIGS = [
    # (remat, unroll, B, compact)
    ("full", "2", 64, ""),            # same-session control
    ("full", "2", 64, "6:2,10:4"),
    ("full", "2", 64, "4:2,8:4"),
]

results = {}
for remat, unroll, B, compact in CONFIGS:
    tag = f"B={B} remat={remat} unroll={unroll} compact={compact or '-'}"
    print(f"=== {tag} ===", flush=True)
    env = dict(os.environ, GOAT_SCAN_UNROLL=unroll, GOAT_COMPACT=compact)
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench_train.py"),
         "--alg", "dagger", "--B", str(B), "--remat", remat],
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
