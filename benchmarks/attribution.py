#!/usr/bin/env python3
"""Long-form divergence attribution (round-4 diagnosis, VERDICT r3 weak #1).

The r03 long_en fidelity row failed the -60 dB gate at -47.14 dB on ALL
device paths identically, meaning the divergence is a reference-semantics
difference upstream of the DSP backends. Two accumulation behaviors of the
reference are candidates, both of the class "sequential f32 accumulation
the TPU paths replace with a closed form":

  * jitter value-noise phase  (src/lib.rs:236-249): production used the
    drift-free cell schedule floor(k*inc)
  * carrier phase             (src/lib.rs:520-525): production uses exact
    Q32 fixed-point accumulation

This script runs the native oracle twin's lab entry point
(gn_oracle_dsp_chain_lab) with each (jitter_mode, carrier_mode) combination
against the true reference chain and reports the fidelity metrics — pure
host C, seconds per 86.5 s config, no TPU needed. The variant
(jitter=driftfree, carrier=Q32) models the r03 production paths and must
reproduce ~-47 dB for the model to be validated; (jitter=exact, carrier=Q32)
predicts the post-fix production number.

JSON lines on stdout.
"""

import argparse
import ctypes
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def lab_chain(pelems, spec, jitter_mode, carrier_mode, jitter_seed=0):
    """gn_oracle_dsp_chain_lab with the marshalling of native_oracle_dsp_chain."""
    from grail_tpu.oracle.reference import NpVoice, oracle_select
    from grail_tpu.runtime.native import _load
    from grail_tpu.synth.score import merge_glides

    lib = _load()
    assert lib is not None, "native library required (make -C native)"
    fn = lib.gn_oracle_dsp_chain_lab
    f32p = ctypes.POINTER(ctypes.c_float)
    fn.restype = ctypes.c_int64
    fn.argtypes = [ctypes.POINTER(ctypes.c_int32),
                   f32p, f32p, f32p, f32p, f32p, f32p, f32p, f32p, f32p,
                   ctypes.c_int64, ctypes.c_float, ctypes.c_uint32,
                   ctypes.c_float, ctypes.c_float, ctypes.c_float,
                   ctypes.c_float, f32p, ctypes.c_int64,
                   ctypes.c_int32, ctypes.c_int32]

    voice = NpVoice.from_spec(spec)
    seq = oracle_select(merge_glides(list(pelems)), voice)
    e = len(seq)
    present = np.zeros(e, np.int32)
    length = np.zeros(e, np.float32)
    blend = np.zeros(e, np.float32)
    freq = np.zeros(e, np.float32)
    fields = [np.zeros((e, 8), np.float32) for _ in range(6)]
    for i, s in enumerate(seq):
        length[i] = s.length
        blend[i] = s.blend_length
        if s.elem is not None:
            present[i] = 1
            freq[i] = s.elem.frequency
            for j, a in enumerate((s.elem.formant_freq, s.elem.formant_bw,
                                   s.elem.formant_smooth, s.elem.formant_breath,
                                   s.elem.formant_turb, s.elem.formant_amp)):
                fields[j][i] = a

    sr = float(voice.sample_rate)
    cap = int(np.ceil(float(np.sum(length.astype(np.float64))) * sr)) + e + 64

    def fp(a):
        return a.ctypes.data_as(f32p)

    out = np.empty(cap, np.float32)
    n = fn(present.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
           fp(length), fp(blend), fp(freq),
           fp(fields[0]), fp(fields[1]), fp(fields[2]),
           fp(fields[3]), fp(fields[4]), fp(fields[5]),
           e, ctypes.c_float(sr), ctypes.c_uint32(jitter_seed),
           ctypes.c_float(float(voice.jitter_frequency)),
           ctypes.c_float(float(voice.jitter_delta_frequency)),
           ctypes.c_float(float(voice.jitter_delta_formant_frequency)),
           ctypes.c_float(float(voice.jitter_delta_amplitude)),
           fp(out), cap,
           ctypes.c_int32(jitter_mode), ctypes.c_int32(carrier_mode))
    assert n >= 0, n
    return out[:n].copy()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--text", default=None, help="override corpus text")
    ap.add_argument("--voice", default="plain")
    ap.add_argument("--language", default="english")
    ap.add_argument("--label", default="long_en")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from benchmarks.fidelity_suite import LONG_EN
    from grail_tpu.api import text_to_phoneme_elems
    from grail_tpu.oracle import gold_dsp_chain
    from grail_tpu.utils import sample_error_db, spectral_error_db
    from grail_tpu.voices import get_spec, get_voice

    text = args.text or LONG_EN
    spec = get_spec(args.voice)
    voice = get_voice(args.voice)
    pelems = text_to_phoneme_elems(text, voice, args.language)
    gold = gold_dsp_chain(pelems, spec)
    seconds = round(len(gold) / float(spec.sample_rate), 1)

    variants = [
        ("true(j=f32,c=f32)", 0, 0),           # sanity: must be 0 error
        ("j=driftfree,c=f32", 1, 0),           # jitter term alone
        ("j=f32,c=q32", 0, 1),                 # carrier term alone
        ("j=driftfree,c=q32", 1, 1),           # models r03 production
    ]
    for name, jm, cm in variants:
        audio = lab_chain(pelems, spec, jm, cm)
        rec = {"bench": "attribution", "config": args.label,
               "variant": name, "seconds": seconds,
               "spectral_error_db": round(spectral_error_db(audio, gold), 2),
               "sample_error_db": round(sample_error_db(audio, gold), 2),
               "bit_exact": bool(len(audio) == len(gold)
                                 and np.array_equal(audio, gold))}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
