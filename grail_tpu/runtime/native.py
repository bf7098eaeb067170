"""ctypes bindings to the native host runtime (native/grail_native.cpp).

The native tier provides the variable-length host-side components —
transcription and PCM encoding — as a C++ shared library, mirroring the
reference's all-native host pipeline. Gracefully degrades to the pure-Python
implementations when the library isn't built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

from ..text.language import Language
from ..text.phonemes import Phoneme

_LIB_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libgrail_native.so"),
]

_lib = None
_load_attempted = False


def _load():
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    for p in _LIB_PATHS:
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
                lib.gn_ruleset_new.restype = ctypes.c_void_p
                lib.gn_ruleset_new.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
                lib.gn_ruleset_free.argtypes = [ctypes.c_void_p]
                lib.gn_transcribe.restype = ctypes.c_int32
                lib.gn_transcribe.argtypes = [
                    ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
                    ctypes.c_int32, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
                lib.gn_encode_wav.restype = ctypes.c_int64
                lib.gn_encode_wav.argtypes = [
                    ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                    ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8)]
                lib.gn_drift_boundaries2.restype = ctypes.c_int64
                lib.gn_drift_boundaries2.argtypes = [
                    ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                    ctypes.c_float, ctypes.c_float,
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_float)]
                lib.gn_jitter_phase_schedule.restype = ctypes.c_int64
                lib.gn_jitter_phase_schedule.argtypes = [
                    ctypes.c_float, ctypes.c_float, ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_int32)]
                _lib = lib
            except (OSError, AttributeError):
                # AttributeError: a stale .so missing a symbol — degrade to
                # the pure-Python implementations rather than crash
                _lib = None
            break
    return _lib


def available() -> bool:
    return _load() is not None


class NativeRuleset:
    """Compiled native ruleset handle for a Language."""

    def __init__(self, language: Language):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built (run `make -C native`)")
        self._lib = lib
        rules = language.rules
        strings = (ctypes.c_char_p * len(rules))(
            *[r.string.encode() for r in rules])
        flat: List[int] = []
        offsets = [0]
        for r in rules:
            flat.extend(int(p) for p in r.phonemes)
            offsets.append(len(flat))
        flat_arr = (ctypes.c_int32 * max(len(flat), 1))(*flat)
        off_arr = (ctypes.c_int32 * len(offsets))(*offsets)
        self._strings_keepalive = strings
        self._handle = lib.gn_ruleset_new(strings, flat_arr, off_arr, len(rules))
        if not self._handle:
            # the native layer rejects empty rule strings (they would spin
            # the automaton); Language validates this too, so reaching here
            # means a constructed-around-validation ruleset
            raise ValueError("ruleset contains an empty rule string")
        self.case_sensitive = language.case_sensitive
        # worst-case phonemes emitted per consumed input char: garbage chars
        # emit 1 (SILENCE); a matched rule emits len(phonemes) for
        # len(string) chars. Sizes the output buffer exactly — the fixed
        # 4x heuristic silently truncated for rules denser than 4 phonemes
        # per char (possible via language files).
        self._max_ratio = max(
            [1] + [-(-len(r.phonemes) // max(len(r.string), 1))
                   for r in rules])

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.gn_ruleset_free(self._handle)
            self._handle = None

    def transcribe(self, text: str) -> List[Phoneme]:
        data = text.encode()
        cap = self._max_ratio * max(len(data), 1) + 16
        out = (ctypes.c_int32 * cap)()
        n = self._lib.gn_transcribe(self._handle, data, len(data),
                                    1 if self.case_sensitive else 0, out, cap)
        return [Phoneme(out[i]) for i in range(n)]


_ruleset_cache: dict = {}


def _language_key(language: Language):
    """Content-based cache key (id() could be reused after GC)."""
    return (language.case_sensitive,
            tuple((r.string, r.phonemes) for r in language.rules))


def native_transcribe(text: str, language: Language) -> Optional[List[Phoneme]]:
    """Native transcription, or None if the library isn't available."""
    if not available():
        return None
    key = _language_key(language)
    rs = _ruleset_cache.get(key)
    if rs is None:
        if len(_ruleset_cache) > 64:  # bound handle lifetime
            _ruleset_cache.clear()
        rs = _ruleset_cache[key] = NativeRuleset(language)
    return rs.transcribe(text)


def native_encode_wav(data: np.ndarray, sample_rate: int) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, np.float32)
    out = (ctypes.c_uint8 * (44 + 2 * len(data)))()
    n = lib.gn_encode_wav(data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          len(data), int(sample_rate), out)
    if n < 0:
        # RIFF sizes are uint32; the encoder refuses instead of writing a
        # wrapped header (the pure-Python struct.pack fails at this bound)
        raise ValueError(
            f"{len(data)} samples exceed the WAV format's uint32 size "
            "limit (~2^31 samples); split the file")
    return bytes(out[:n])


def native_drift_boundaries(lengths: np.ndarray, sample_rate: float,
                            t0: float = 0.0):
    """Reference-sequencer drift simulation (gn_drift_boundaries): element
    end-samples of the per-sample f32 countdown, bit-identical to the NumPy
    twin in synth/score.py:_reference_boundary_samples but ~50x faster —
    this is the serving frontend's per-feed host cost. Returns
    (counts_cum int64 [E], residuals f32 [E]), or None without the lib."""
    lib = _load()
    if lib is None or getattr(lib, "gn_drift_boundaries2", None) is None:
        return None
    lengths = np.ascontiguousarray(lengths, np.float32)
    e = len(lengths)
    counts = np.empty(e, np.int64)
    residuals = np.empty(e, np.float32)
    if e:
        stall = lib.gn_drift_boundaries2(
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), e,
            ctypes.c_float(float(sample_rate)), ctypes.c_float(float(t0)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            residuals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if stall >= 0:
            # same conditions the NumPy twin raises on (score.py)
            bad = float(lengths[stall])
            if np.isnan(bad):
                raise ValueError(
                    f"element length must be finite, got NaN "
                    f"(element {stall})")
            raise ValueError(
                f"element length {bad:.1f}s stalls the reference's f32 "
                "countdown (dt is below half an ulp); the reference "
                "sequencer would never advance past it — split the element")
    return counts, residuals


def native_jitter_schedule(inc, phase0, T: int, phi: np.ndarray,
                           cell: np.ndarray):
    """Reference value-noise phase recurrence (gn_jitter_phase_schedule):
    T steps of `phase = f32(phase + inc); if phase > 1: phase -= 1` from
    `phase0` into phi f32 [T] / cell i32 [T] (cell = wraps since this call,
    including a wrap at that sample). Returns the total wrap count, or None
    without the library (synth/schedule.py falls back to the NumPy twin)."""
    lib = _load()
    if lib is None or getattr(lib, "gn_jitter_phase_schedule", None) is None:
        return None
    assert phi.dtype == np.float32 and cell.dtype == np.int32
    assert phi.flags.c_contiguous and cell.flags.c_contiguous
    assert len(phi) >= T and len(cell) >= T
    return int(lib.gn_jitter_phase_schedule(
        ctypes.c_float(float(inc)), ctypes.c_float(float(phase0)), int(T),
        phi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cell.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))))


__all__ = ["available", "NativeRuleset", "native_transcribe",
           "native_encode_wav", "native_drift_boundaries",
           "native_jitter_schedule"]
