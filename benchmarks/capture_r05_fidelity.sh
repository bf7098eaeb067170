#!/bin/bash
# FIDELITY_r05 capture: the full corpus (fidelity_suite.py CONFIGS) on TPU.
# Round-5 focus: the long_* configs now include the batched unsplit kernel
# (fused_unsplit) and BOTH streaming product paths (stream, stream_pool) —
# the Q32-carrier gate hole VERDICT r4 missing #1 asks to close with rows.
# Each config appends to its OWN per-step file under $LOG; the artifact is
# assembled from all step files after every step (a re-run of one step can
# never silently drop another step's rows).
# ONE tunnel client at a time: pass a PID as $1 to wait for it first.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/capture_r05
mkdir -p "$LOG"
[ $# -ge 1 ] && while kill -0 "$1" 2>/dev/null; do sleep 10; done

python benchmarks/fidelity_suite.py --warm >> "$LOG/warm.log" 2>&1

run() {  # run <label>  (fidelity_suite drives per-config paths itself)
  local label=$1
  echo "== $(date -u +%H:%M:%S) fidelity:$label =="
  timeout 1500 python benchmarks/fidelity_suite.py --tpu --only "$label" \
      > "$LOG/fid_$label.json" 2>>"$LOG/fid_$label.err"
  local rc=$?
  echo "   rc=$rc rows=$(grep -c '"bench"' "$LOG/fid_$label.json" 2>/dev/null || echo 0)"
  assemble
}

assemble() {
  cat "$LOG"/fid_*.json 2>/dev/null | grep '"bench"' > FIDELITY_r05.json
}

# priority order: the gate-relevant long-form rows (batched + streamed)
# first, then the preset/parity re-measures
for c in long_en long_es long_de long_fr vowel english contour glide \
         plosive contour_es rate48000 rate22050 francais bright deep \
         whisper; do
  run "$c"
done
echo "fidelity r05 done: $(grep -c '"bench"' FIDELITY_r05.json) rows, \
$(grep -c '"pass_minus60": true' FIDELITY_r05.json) passing"
