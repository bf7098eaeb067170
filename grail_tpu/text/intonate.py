"""Intonation: Phoneme -> PhonemeElem (adds pitch + duration).

The reference Intonator (/root/reference/src/lib.rs:1047-1089) is a stub: it
emits a fixed 0.5 s length, 0.5 s blend, and the voice's constant center
frequency for every phoneme (its TODOs at src/lib.rs:1062-1066 list contour,
speaking rate and per-phoneme durations as planned work; README.md:15 plans a
lookahead ruleset). The driver's target configs require a *working* intonator,
so we ship two:

  * `intonate(..., contour=False)`  - the reference's exact stub semantics
    (used for parity / golden tests).
  * `intonate(..., contour=True)`   - a real contour: per-class durations,
    declining F0 with accent bumps, phrase-final lengthening and fall,
    speaking-rate control. Pure host-side preprocessing; the device kernel
    only ever sees the resulting parameter score.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

from .language import Language
from .phonemes import Phoneme, is_sound


@dataclass(frozen=True)
class PhonemeElem:
    """Reference PhonemeElem (src/lib.rs:960-973)."""

    phoneme: Phoneme
    length: float        # seconds
    blend_length: float  # seconds
    frequency: float     # normalized to sample rate


# --- duration classes (seconds, at speaking_rate=1.0) for the contour mode
_VOWELS = {"A", "E", "I", "O", "U", "AE", "AH", "IH", "EH", "UH", "OW"}
_NASALS_LIQUIDS = {"M", "N", "NG", "L", "R", "W", "Y"}
_FRICATIVES = {"V", "Z", "ZH", "DH", "F", "S", "SH", "TH", "H"}
_PLOSIVES = {"P", "B", "T", "D", "K", "G"}


def _duration(p: Phoneme) -> float:
    name = p.name
    if name in _VOWELS:
        return 0.16
    if name in _NASALS_LIQUIDS:
        return 0.10
    if name in _FRICATIVES:
        return 0.11
    if name in _PLOSIVES:
        return 0.05  # short release burst
    if p == Phoneme.STOP:
        return 0.04  # closure gap
    if p == Phoneme.SILENCE:
        return 0.12
    return 0.10


def intonate(
    phonemes: Sequence[Phoneme],
    language: Language,
    voice,
    contour: bool = False,
    speaking_rate: float = 1.0,
    seed: int = 0,
) -> List[PhonemeElem]:
    """Assign length/blend/pitch to a phoneme sequence.

    With contour=False this reproduces the reference stub exactly:
    length=0.5, blend_length=0.5, frequency=voice.center_frequency
    (src/lib.rs:1068-1073). `language` is accepted-and-unused exactly like
    the reference's `_language` parameter.
    """
    del language  # reference signature parity: _language is unused there too
    cf = float(voice.center_frequency)
    if not contour:
        return [PhonemeElem(p, 0.5, 0.5, cf) for p in phonemes]

    elems: List[PhonemeElem] = []
    n = len(phonemes)
    # count sound phonemes for the declination slope
    n_sound = max(1, sum(1 for p in phonemes if is_sound(p)))
    sound_i = 0
    for i, p in enumerate(phonemes):
        dur = _duration(p) / max(speaking_rate, 1e-3)
        is_last_window = i >= n - 3
        if is_sound(p):
            # declination: F0 falls ~20% across the phrase
            pos = sound_i / n_sound
            f = cf * (1.10 - 0.25 * pos)
            # accent bump on alternating early vowels
            if p.name in _VOWELS and sound_i % 2 == 0 and pos < 0.8:
                f *= 1.06
            # phrase-final fall + lengthening
            if is_last_window:
                f *= 0.92
                dur *= 1.35
            sound_i += 1
        else:
            f = cf
        blend = min(0.5 * dur, 0.06 / max(speaking_rate, 1e-3))
        elems.append(PhonemeElem(p, dur, blend, f))
    return elems


__all__ = ["PhonemeElem", "intonate"]
