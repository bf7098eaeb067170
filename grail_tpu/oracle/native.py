"""ctypes binding for the native oracle twin (native/grail_oracle.cpp).

`gn_oracle_dsp_chain` is the reference DSP chain downstream of selection
(sequencer -> jitter -> synthesize, /root/reference/src/lib.rs:813-953,
:723-805, :467-600) written independently in C++ with strict per-op f32
rounding. It is pinned bit-identical to the pure-NumPy oracle
(tests/test_native_oracle.py) and ~3 orders of magnitude faster, which is
what makes wide/long-form fidelity gold generation affordable (~8 min of
NumPy per 60 s of audio otherwise). Selection itself (voice table lookup +
GLIDE merge) stays in Python — it is O(elements), not O(samples).
"""

from __future__ import annotations

import ctypes
from typing import Optional, Sequence

import numpy as np

from ..runtime.native import _load
from ..voices.voice import VoiceSpec
from .reference import NpVoice, oracle_select

_registered = False


def _oracle_fn():
    """The gn_oracle_dsp_chain symbol with argtypes set, or None."""
    global _registered
    lib = _load()
    if lib is None:
        return None
    fn = getattr(lib, "gn_oracle_dsp_chain", None)
    if fn is None:  # stale .so predating the oracle twin
        return None
    if not _registered:
        f32p = ctypes.POINTER(ctypes.c_float)
        fn.restype = ctypes.c_int64
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_int32),           # present [E]
            f32p, f32p, f32p,                         # length, blend, freq [E]
            f32p, f32p, f32p, f32p, f32p, f32p,       # 6 formant fields [E,8]
            ctypes.c_int64,                           # E
            ctypes.c_float,                           # sample_rate
            ctypes.c_uint32,                          # jitter seed
            ctypes.c_float, ctypes.c_float,           # jf, jdf
            ctypes.c_float, ctypes.c_float,           # jdff, jda
            f32p, ctypes.c_int64,                     # out, out_cap
        ]
        _registered = True
    return fn


def native_oracle_available() -> bool:
    return _oracle_fn() is not None


def _marshal_and_run(fn, pelems: Sequence, spec: VoiceSpec,
                     jitter_seed: int) -> np.ndarray:
    """Select + marshal a PhonemeElem sequence into the native chain ABI
    and run `fn` (gn_oracle_dsp_chain or gn_carrier_phase_track — same
    argument layout) with output-capacity retry."""
    from ..synth.score import merge_glides

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
                                   s.elem.formant_smooth,
                                   s.elem.formant_breath,
                                   s.elem.formant_turb, s.elem.formant_amp)):
                fields[j][i] = a

    bad = np.flatnonzero(~np.isfinite(length))
    if len(bad):
        i = int(bad[0])
        raise ValueError(
            f"element {i} has non-finite length {length[i]!r}; the "
            "reference sequencer would never terminate on it")

    sr = float(voice.sample_rate)
    # the countdown emits ~sum(lengths)*sr samples; drift moves boundaries
    # by single samples, so a per-element +1 margin is generous
    cap = int(np.ceil(float(np.sum(length.astype(np.float64))) * sr)) + e + 64

    def fp(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    for _ in range(3):  # cap-retry belt (drift can only add O(E) samples)
        out = np.empty(cap, np.float32)
        n = fn(present.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
               fp(length), fp(blend), fp(freq),
               fp(fields[0]), fp(fields[1]), fp(fields[2]),
               fp(fields[3]), fp(fields[4]), fp(fields[5]),
               e, ctypes.c_float(sr),
               ctypes.c_uint32(int(jitter_seed) & 0xFFFFFFFF),
               ctypes.c_float(float(voice.jitter_frequency)),
               ctypes.c_float(float(voice.jitter_delta_frequency)),
               ctypes.c_float(float(voice.jitter_delta_formant_frequency)),
               ctypes.c_float(float(voice.jitter_delta_amplitude)),
               fp(out), cap)
        if n >= 0:
            return out[:n].copy()
        if n <= -2:
            i = -(n + 2)
            raise ValueError(
                f"element {i} has non-finite length {length[i]!r}; the "
                "reference sequencer would never terminate on it")
        cap *= 2  # n == -1: capacity exceeded
    raise RuntimeError("native oracle output capacity retry exhausted")


def native_oracle_dsp_chain(pelems: Sequence, spec: VoiceSpec,
                            jitter_seed: int = 0) -> Optional[np.ndarray]:
    """Native twin of oracle_dsp_chain: timed PhonemeElems -> f32 samples.

    Same signature and (bit-exact) output as reference.oracle_dsp_chain;
    returns None when the native library isn't built, so callers can fall
    back to the NumPy oracle.
    """
    fn = _oracle_fn()
    if fn is None:
        return None
    return _marshal_and_run(fn, pelems, spec, jitter_seed)


def native_carrier_phase_track(pelems: Sequence, spec: VoiceSpec,
                               jitter_seed: int = 0) -> Optional[np.ndarray]:
    """The reference's exact f32 carrier phase per sample (PRE-update, the
    value polyBLEP/saw consume; /root/reference/src/lib.rs:520-525), from
    the native frequency-chain pre-pass (gn_carrier_phase_track). The
    device's exact-carrier paths consume this in place of the Q32
    fixed-point accumulator, removing the dominant long-form residual
    (Q32-vs-f32 carrier drift: -60.7 dB alone at 86.5 s, docs/PARITY.md).
    Returns None when the native library isn't built or predates the
    symbol — callers then stay on the Q32 carrier."""
    global _track_registered
    lib = _load()
    if lib is None:
        return None
    fn = getattr(lib, "gn_carrier_phase_track", None)
    if fn is None:
        return None
    if not _track_registered:
        oracle = _oracle_fn()   # same ABI; reuse its argtypes
        fn.restype = ctypes.c_int64
        fn.argtypes = oracle.argtypes
        _track_registered = True
    return _marshal_and_run(fn, pelems, spec, jitter_seed)


_track_registered = False


def gold_dsp_chain(pelems: Sequence, spec: VoiceSpec,
                   jitter_seed: int = 0) -> np.ndarray:
    """Fidelity gold: the native twin when built, else the NumPy oracle.

    The two implementations are pinned bit-identical
    (tests/test_native_oracle.py), so which one produced a gold never
    affects a fidelity verdict.
    """
    out = native_oracle_dsp_chain(pelems, spec, jitter_seed=jitter_seed)
    if out is not None:
        return out
    from .reference import oracle_dsp_chain

    return oracle_dsp_chain(pelems, spec, jitter_seed=jitter_seed)


__all__ = ["native_oracle_available", "native_oracle_dsp_chain",
           "native_carrier_phase_track", "gold_dsp_chain"]
