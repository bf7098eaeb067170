#!/usr/bin/env python3
"""FIDELITY_r03 config sweep: runs benchmarks/fidelity.py once per config
and streams the JSON lines (tee into FIDELITY_r03.json on TPU).

Corpus (VERDICT r2 weak #5 — contour mode, long-form, resample — plus the
round-2 parity configs):
  * the 4 r02 configs (vowel, english, glide-diphthong, deutsch-plosive)
  * a contour-intonation config (multi-clause, question + statement)
  * >= 60 s long-form multi-clause texts for all four languages
  * resample configs at 22050 and 48000 Hz

Long-form and resample configs run the production fused path + the XLA
reference core (the oracle dominates cost; add --all for every path).
"""

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

# Long-form drift gates: with the stub intonator each phoneme spans 0.5 s,
# so these ~150-char multi-clause texts synthesize to ~70-110 s — past the
# >=60 s VERDICT gate but inside the capture budget (the sequential oracle
# is the cost: ~8 min per 60 s of audio). Do NOT scale these up with
# repetition: past ~190 s cumulative time the reference's f32 countdown
# grid becomes coarser than one sample (score.py boundary-retarget warning).
LONG_EN = ("the quick brown fox jumps over the lazy dog, while seventeen "
           "synthesizers hum along in the hall. is anyone still listening "
           "to this? the formants drift on and on.")
LONG_ES = ("el rapido zorro marron salta sobre el perro perezoso, mientras "
           "los sintetizadores cantan en la sala. hay alguien escuchando "
           "todavia? la voz sigue y sigue sin parar.")
LONG_DE = ("der schnelle braune fuchs springt ueber den faulen hund, "
           "waehrend siebzehn maschinen im saal summen. hoert da noch "
           "jemand zu? die formanten wandern weiter und weiter.")
LONG_FR = ("le rapide renard brun saute par dessus le chien paresseux, "
           "pendant que les machines chantent dans la salle. quelqu un "
           "ecoute t il encore? la voix continue sans fin.")

CONFIGS = [
    # label, extra args, all-paths?
    ("vowel",    ["--text", "aeae", "--voice", "generic",
                  "--language", "generic"], True),
    ("english",  ["--text", "hello", "--voice", "plain",
                  "--language", "english"], True),
    ("glide",    ["--text", "say hi", "--voice", "plain",
                  "--language", "english"], True),
    ("plosive",  ["--text", "guten tag", "--voice", "plain",
                  "--language", "deutsch"], True),
    ("contour",  ["--text", "hello there, how are you today? fine thanks.",
                  "--voice", "plain", "--language", "english",
                  "--contour"], True),
    ("contour_es", ["--text",
                    "buenos dias amigos, que tal estas hoy? muy bien.",
                    "--voice", "plain", "--language", "espanol",
                    "--contour"], True),
    ("long_en",  ["--text", LONG_EN, "--voice", "plain",
                  "--language", "english"], False),
    ("long_es",  ["--text", LONG_ES, "--voice", "plain",
                  "--language", "espanol"], False),
    ("long_de",  ["--text", LONG_DE, "--voice", "plain",
                  "--language", "deutsch"], False),
    ("long_fr",  ["--text", LONG_FR, "--voice", "plain",
                  "--language", "francais"], False),
    ("rate22050", ["--text", "aeae", "--voice", "generic",
                   "--language", "generic", "--rate", "22050"], True),
    ("rate48000", ["--text", "hello", "--voice", "plain",
                   "--language", "english", "--rate", "48000"], True),
    # every shipped preset gets >= 1 row (VERDICT r3 next #2): the three
    # voice variants (voices/preset_variants.py) and a short francais row
    ("francais", ["--text", "bonjour tout le monde", "--voice", "plain",
                  "--language", "francais"], False),
    ("bright",   ["--text", "hello there", "--voice", "bright",
                  "--language", "english"], False),
    ("deep",     ["--text", "hello there", "--voice", "deep",
                  "--language", "english"], False),
    ("whisper",  ["--text", "hello there", "--voice", "whisper",
                  "--language", "english"], False),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--all", action="store_true",
                    help="run every path for every config (slow)")
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of config labels")
    ap.add_argument("--warm", action="store_true",
                    help="CPU pre-warm: compute + disk-cache every "
                         "config's oracle waveform (.oracle_cache/) and "
                         "exit — a later --tpu run then only pays device "
                         "time inside the tunnel window")
    args = ap.parse_args()

    # long-form configs: the gate-relevant set now includes the batched
    # unsplit kernel and BOTH streaming product paths (round-5 VERDICT
    # missing #1 — these rode the Q32 carrier through round 4 and had zero
    # long-form rows; all ride the exact f32 carrier since round 5)
    fast_paths = (["fused", "fused_unsplit", "stream", "stream_pool",
                   "xla_block"] if args.tpu
                  else ["fused_interpret", "xla_block"])
    for label, extra, all_paths in CONFIGS:
        if args.only and label not in args.only:
            continue
        cmd = [sys.executable, os.path.join(HERE, "fidelity.py"),
               "--label", label] + extra
        if args.warm:
            cmd.append("--gold-only")
        elif args.tpu:
            cmd.append("--tpu")
        if not args.warm and not (all_paths or args.all):
            cmd += ["--paths"] + fast_paths
        r = subprocess.run(cmd, cwd=os.path.dirname(HERE))
        if r.returncode != 0:
            print(f'{{"bench": "fidelity", "config": "{label}", '
                  f'"error": "exit {r.returncode}"}}', flush=True)


if __name__ == "__main__":
    main()
