#!/bin/bash
# Re-run the one fidelity config (contour) that hit a 900 s tunnel stall in
# the r04 chain (rc=124, 0 rows). Waits for the perf chain first: ONE tunnel
# client at a time on this single-core host.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/capture_r04
[ $# -ge 1 ] && while kill -0 "$1" 2>/dev/null; do sleep 10; done

for attempt in 1 2 3; do
  echo "== $(date -u +%H:%M:%S) fidelity:contour retry $attempt =="
  timeout 1200 python benchmarks/fidelity_suite.py --tpu --only contour \
      > "$LOG/fid_contour.json" 2>>"$LOG/fid_contour.err"
  rc=$?
  rows=$(grep -c '"bench"' "$LOG/fid_contour.json" 2>/dev/null || echo 0)
  echo "   rc=$rc rows=$rows"
  [ "$rows" -gt 0 ] && break
done
cat "$LOG"/fid_*.json 2>/dev/null | grep '"bench"' > FIDELITY_r04.json
echo "assembled: $(grep -c '"bench"' FIDELITY_r04.json) rows, \
$(grep -c '"pass_minus60": true' FIDELITY_r04.json) passing"
