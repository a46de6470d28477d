#!/bin/bash
# Loop the bounded TPU probe until the tunnel answers (or ~11h elapse).
# Exits 0 the moment a probe succeeds, non-zero on giving up.  Run in the
# background; NEVER run TPU work concurrently with it (axon rule: one
# process at a time) — it sleeps 600s between probes, so wait for the next
# gap or kill it by PID before starting real TPU work.
set -u
cd "$(dirname "$0")/.."
DEADLINE=$(( $(date +%s) + 11*3600 ))
N=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  N=$((N+1))
  echo "[probe $N] $(date -u +%H:%M:%S) trying..."
  if timeout 95 python tools/tpu_probe.py; then
    echo "[probe $N] TPU UP at $(date -u +%H:%M:%S)"
    touch /tmp/tpu_up.marker
    exit 0
  fi
  echo "[probe $N] down (rc=$?); sleeping 600s"
  sleep 600
done
echo "gave up after ~11h"
exit 1
