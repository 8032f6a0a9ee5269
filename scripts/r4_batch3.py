"""Round-4 batch 3: model_probs/model_wide inner-policy remat x scan
unroll, on-chip.  Sequential single process (tunnel discipline)."""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CONFIGS = [
    # (remat, unroll, B)
    ("model_wide", "2", 64),
    ("model_probs", "2", 64),
    ("model", "4", 64),
    ("model_wide", "4", 64),
]

results = {}
for remat, unroll, B in CONFIGS:
    tag = f"B={B} remat={remat} unroll={unroll}"
    print(f"=== {tag} ===", flush=True)
    env = dict(os.environ, GOAT_SCAN_UNROLL=unroll)
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench_train.py"),
         "--alg", "dagger", "--B", str(B), "--remat", remat],
        env=env, capture_output=True, text=True, timeout=3600)
    out = p.stdout.strip().splitlines()
    print("\n".join(out[-2:]) if out else f"FAILED rc={p.returncode}",
          flush=True)
    if p.returncode != 0:
        print(p.stderr.strip().splitlines()[-5:], flush=True)
        results[tag] = None
        continue
    for line in out:
        if "eps/s=" in line:
            results[tag] = float(line.split("eps/s=")[1].split()[0])
print("=== summary ===", flush=True)
for k, v in results.items():
    print(f"  {k}: {v}", flush=True)
