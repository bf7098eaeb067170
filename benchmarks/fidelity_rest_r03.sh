#!/bin/bash
# Remaining FIDELITY_r03 configs after the capture chain was re-prioritized
# (vowel+english already measured). Waits for any running axon client
# (PID in $1) to exit first — ONE tunnel client at a time.
# Trimmed paths: the production fused split (fused), the XLA reference core
# (xla_block), and the plain-synthesize() production default (solo_default);
# long-form configs use fused+xla_block, matching fidelity_suite's own
# fast-path policy. Priority: the three new VERDICT-r2 config families
# (contour / resample / long-form) before the r02 parity re-measures.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/capture_r03
[ $# -ge 1 ] && while kill -0 "$1" 2>/dev/null; do sleep 10; done

run() {  # run <label> <paths...> -- <fidelity.py args...>
  local label=$1; shift
  local paths=()
  while [ "$1" != "--" ]; do paths+=("$1"); shift; done
  shift
  echo "== $(date -u +%H:%M:%S) fidelity:$label =="
  timeout 900 python benchmarks/fidelity.py --tpu --label "$label" \
      --paths "${paths[@]}" "$@" >> "$LOG/fidelity.json" 2>>"$LOG/fidelity2.err"
  echo "   rc=$?"
  cp "$LOG/fidelity.json" FIDELITY_r03.json
}

P3="fused xla_block solo_default"
run contour   $P3 -- --text "hello there, how are you today? fine thanks." \
    --voice plain --language english --contour
run rate22050 $P3 -- --text aeae --voice generic --language generic --rate 22050
run rate48000 $P3 -- --text hello --voice plain --language english --rate 48000
run glide     $P3 -- --text "say hi" --voice plain --language english
run plosive   $P3 -- --text "guten tag" --voice plain --language deutsch
run contour_es $P3 -- --text "buenos dias amigos, que tal estas hoy? muy bien." \
    --voice plain --language espanol --contour
LONG_EN="the quick brown fox jumps over the lazy dog, while seventeen synthesizers hum along in the hall. is anyone still listening to this? the formants drift on and on."
LONG_ES="el rapido zorro marron salta sobre el perro perezoso, mientras los sintetizadores cantan en la sala. hay alguien escuchando todavia? la voz sigue y sigue sin parar."
LONG_DE="der schnelle braune fuchs springt ueber den faulen hund, waehrend siebzehn maschinen im saal summen. hoert da noch jemand zu? die formanten wandern weiter und weiter."
LONG_FR="le rapide renard brun saute par dessus le chien paresseux, pendant que les machines chantent dans la salle. quelqu un ecoute t il encore? la voix continue sans fin."
run long_en $P3 -- --text "$LONG_EN" --voice plain --language english
run long_es "fused xla_block" -- --text "$LONG_ES" --voice plain --language espanol
run long_de "fused xla_block" -- --text "$LONG_DE" --voice plain --language deutsch
run long_fr "fused xla_block" -- --text "$LONG_FR" --voice plain --language francais
echo "fidelity remainder done"
