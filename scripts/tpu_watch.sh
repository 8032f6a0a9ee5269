#!/usr/bin/env bash
# TPU tunnel recovery watcher.  The axon relay (/root/.tpu_init.py) can
# die mid-session (observed 2026-08-17: every client hangs at backend
# init or fails UNAVAILABLE; the relay ignores signals and only the
# driver side can respawn it).  This loop probes a tiny matmul every
# 3 minutes and launches the given command once the chip answers.
#
#   nohup bash scripts/tpu_watch.sh 'python scripts/r3_batch3.py > /tmp/r3.log 2>&1' &
CMD="${1:-echo TPU recovered}"
while true; do
  python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)); float((x @ x)[0, 0])
" >/dev/null 2>&1 && break
  sleep 180
done
echo "TPU recovered $(date -u +%H:%M); launching: $CMD"
nohup bash -c "$CMD" &
