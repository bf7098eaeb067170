#!/bin/bash
# FIDELITY_r04 capture: the full corpus (fidelity_suite.py CONFIGS) on TPU.
# Each config appends to its OWN per-step file under $LOG; the artifact is
# assembled from all step files at the end (ADVICE r3 #1: a re-run of one
# step can no longer silently drop another step's rows).
# ONE tunnel client at a time: pass a PID as $1 to wait for it first.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/capture_r04
mkdir -p "$LOG"
[ $# -ge 1 ] && while kill -0 "$1" 2>/dev/null; do sleep 10; done

python benchmarks/fidelity_suite.py --warm >> "$LOG/warm.log" 2>&1

run() {  # run <label>  (fidelity_suite drives per-config paths itself)
  local label=$1
  echo "== $(date -u +%H:%M:%S) fidelity:$label =="
  timeout 900 python benchmarks/fidelity_suite.py --tpu --only "$label" \
      > "$LOG/fid_$label.json" 2>>"$LOG/fid_$label.err"
  local rc=$?
  echo "   rc=$rc rows=$(grep -c '"bench"' "$LOG/fid_$label.json" 2>/dev/null || echo 0)"
  assemble
}

assemble() {
  cat "$LOG"/fid_*.json 2>/dev/null | grep '"bench"' > FIDELITY_r04.json
}

# priority order: the r3-red long-form gates first, then the new presets,
# then the r02/r03 parity re-measures
for c in long_en long_es long_de long_fr francais bright deep whisper \
         vowel english contour rate48000 rate22050 glide plosive contour_es; do
  run "$c"
done
echo "fidelity r04 done: $(grep -c '"bench"' FIDELITY_r04.json) rows, \
$(grep -c '"pass_minus60": true' FIDELITY_r04.json) passing"
