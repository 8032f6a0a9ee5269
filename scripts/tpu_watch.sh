#!/usr/bin/env bash
# TPU tunnel recovery watcher.  The axon relay (/root/.tpu_init.py) can
# die mid-session (observed 2026-08-17: every client hangs at backend
# init or fails UNAVAILABLE; the relay ignores signals and only the
# driver side can respawn it).  This loop probes a tiny matmul every
# 3 minutes and launches the given command once the chip answers.
#
#   nohup bash scripts/tpu_watch.sh 'python scripts/r3_batch3.py > /tmp/r3.log 2>&1' &
# A second degradation mode exists: the chip answers but every RPC takes
# ~1s (timings then measure dispatch latency, not compute).  Probe with
# the latency-aware health check so A/B batches only launch on a sane
# tunnel (scripts/tpu_health.py).
CMD="${1:-echo TPU recovered}"
HERE="$(cd "$(dirname "$0")" && pwd)"
while true; do
  timeout 300 python "$HERE/tpu_health.py" --budget 3 >/dev/null 2>&1 && break
  sleep 180
done
echo "TPU recovered $(date -u +%H:%M); launching: $CMD"
nohup bash -c "$CMD" &
