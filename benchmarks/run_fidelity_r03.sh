#!/bin/bash
# FIDELITY_r03 corpus: the four r02 parity configs + the round-3 additions
# (VERDICT r2 weak #5): contour-intonator gate, >=60 s long-form per
# language, on-TPU resample rows. Every row must report
# spectral_error_db < -60. Long-form rows restrict to the production
# paths (the sequential oracle is the cost; 60 s of oracle is ~8 min).
set -e
cd "$(dirname "$0")/.."
OUT="${1:-FIDELITY_r03.json}"
: > "$OUT"
run() { python benchmarks/fidelity.py "$@" 2>/dev/null | tee -a "$OUT"; }

# r02 parity configs
run --tpu --text "aeae"
run --tpu --text "hello" --voice plain --language english
run --tpu --text "guten tag" --voice plain --language deutsch
run --tpu --text "say hi" --voice plain --language english

# contour-intonator gates (stub parity already covered above)
run --tpu --contour --label contour_en --voice plain --language english \
    --text "hello world, how are you today? i am fine, thank you."
run --tpu --contour --label contour_es --voice plain --language espanol \
    --text "buenos dias amigos, que tal estas hoy? muy bien, gracias."

# resample rows (src/lib.rs:20-21): voice retargeted, same physical formants
run --tpu --rate 22050 --label resample22050 --voice plain \
    --language english --text "hello"
run --tpu --rate 48000 --label resample48000 --voice plain \
    --language english --text "hello"

# long-form (>=60 s, multi-clause) — drift gate; production paths only
LONG_PATHS="xla_block fused solo_default"
run --tpu --label longform_en --voice plain --language english \
    --paths $LONG_PATHS --text "the quick brown fox jumps over the lazy dog, while seventeen synthesizers hum along in the hall. is anyone still listening to this? the formants drift on and on, and the story never quite ends."
run --tpu --label longform_de --voice plain --language deutsch \
    --paths $LONG_PATHS --text "guten tag meine damen und herren, heute sprechen wir ueber die synthese von klaengen. wer haette das gedacht? die maschine spricht weiter, immer weiter, bis zum ende."
run --tpu --label longform_es --voice plain --language espanol \
    --paths $LONG_PATHS --text "buenos dias amigos, hoy vamos a hablar de la sintesis de la voz. quien lo hubiera pensado? la maquina sigue hablando sin parar, hasta el final."
run --tpu --label longform_fr --voice plain --language francais \
    --paths $LONG_PATHS --text "bonjour mes amis, aujourd hui nous parlons de la synthese de la voix. qui aurait pense cela? la machine continue de parler sans fin, jusqu au bout."
