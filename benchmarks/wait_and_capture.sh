#!/bin/bash
# Wait for the axon TPU tunnel to come alive, then run the round-3
# capture chain. The tunnel's availability swings on a minutes-to-hours
# scale; capture_r03.sh itself serializes the steps and bounds each one.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/capture_r03
mkdir -p "$LOG"

alive() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import numpy as np, jax
np.asarray(jax.device_put(np.zeros(8, np.int8)))
EOF
}

have_artifacts() {
  [ -s SERVING_r03.json ] && [ -s FIDELITY_r03.json ] \
    && [ -s THROUGHPUT_r03.json ]
}

for attempt in 1 2 3; do
  echo "$(date -u +%H:%M:%S) attempt $attempt: waiting for tunnel..." \
    | tee -a "$LOG/wait.log"
  until alive; do
    echo "$(date -u +%H:%M:%S) tunnel dead, retry in 120s" >> "$LOG/wait.log"
    sleep 120
  done
  echo "$(date -u +%H:%M:%S) tunnel alive -> capture" | tee -a "$LOG/wait.log"
  bash benchmarks/capture_r03.sh 2>&1 | tee -a "$LOG/wait.log"
  if have_artifacts; then
    echo "$(date -u +%H:%M:%S) all r03 artifacts present" | tee -a "$LOG/wait.log"
    break
  fi
  echo "$(date -u +%H:%M:%S) artifacts incomplete after attempt $attempt" \
    | tee -a "$LOG/wait.log"
  sleep 300
done
