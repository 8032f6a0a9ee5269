#!/bin/bash
# Serialized TPU job runner (round 5).  The axon tunnel is effectively
# single-client and a timeout-killed TPU process poisons it for ~30-60 min
# (.claude/skills/verify/SKILL.md), so exactly ONE process may touch the
# TPU at a time.  This runner polls tunnel health and executes job scripts
# from /tmp/r5_jobs/*.sh in lexical order, one at a time, never killing
# them.  Append a job by writing /tmp/r5_jobs/NN_name.sh; output lands in
# /tmp/r5_jobs/NN_name.log; finished jobs move to /tmp/r5_jobs/done/.
QDIR=/tmp/r5_jobs
LOG=/tmp/r5_runner.log
mkdir -p "$QDIR/done"
cd /root/repo || exit 1
echo "runner start $(date +%T) pid=$$" >> "$LOG"
while true; do
  # /tmp/r5_stop: freeze the queue (e.g. near round end, so a late job
  # can't collide with the driver's own bench.py run on the tunnel)
  if [ -f /tmp/r5_stop ]; then sleep 60; continue; fi
  job=$(ls "$QDIR"/*.sh 2>/dev/null | head -1)
  if [ -z "$job" ]; then sleep 60; continue; fi
  if python scripts/tpu_health.py --budget 3.0 >> "$LOG" 2>&1; then
    echo "RUN $job $(date +%T)" >> "$LOG"
    bash "$job" > "${job%.sh}.log" 2>&1
    echo "DONE $job rc=$? $(date +%T)" >> "$LOG"
    mv "$job" "$QDIR/done/"
  else
    echo "degraded, sleeping 240s ($(date +%T))" >> "$LOG"
    sleep 240
  fi
done
