"""The native C++ oracle twin is bit-identical to the NumPy oracle.

Two independently written implementations of the reference DSP chain
(sequencer /root/reference/src/lib.rs:813-953, jitter :723-805, synthesize
:467-600) agreeing bit-for-bit on every sample is the strongest ground-truth
evidence available in an environment with no rustc: an error in either
port's reading of the Rust would have to be made twice, in two languages,
with different expression forms, to go unnoticed.
"""

import numpy as np
import pytest

from grail_tpu import languages as lang_mod
from grail_tpu.api import text_to_phoneme_elems
from grail_tpu.oracle import (
    gold_dsp_chain, native_oracle_available, native_oracle_dsp_chain,
    oracle_dsp_chain,
)
from grail_tpu.text.intonate import PhonemeElem
from grail_tpu.text.phonemes import Phoneme
from grail_tpu.voices import get_spec, get_voice

pytestmark = pytest.mark.skipif(
    not native_oracle_available(),
    reason="native library not built (make -C native)")


def _bits_equal(a: np.ndarray, b: np.ndarray) -> bool:
    return a.shape == b.shape and np.array_equal(
        a.view(np.uint32), b.view(np.uint32))


def _pelems(text, voice_name="generic", language="generic", contour=False):
    return text_to_phoneme_elems(text, get_voice(voice_name),
                                 lang_mod.get_language(language),
                                 contour=contour)


@pytest.mark.parametrize("text,voice,language,contour,seed", [
    # stub intonation, specials (p -> Silence), glide (ii), garbage chars
    ("aeae", "generic", "generic", False, 0),
    ("iip x oui", "generic", "generic", False, 7),
    # contour prosody (clause-typed pitch, varying lengths) on a real language
    ("Hello there, how are you?", "plain", "english", True, 3),
    # full 34-sound voice incl. fricatives/plosives via espanol rules
    ("buenos dias amigo", "bright", "espanol", True, 123456789),
])
def test_native_twin_bitexact(text, voice, language, contour, seed):
    pel = _pelems(text, voice, language, contour=contour)
    g_py = oracle_dsp_chain(pel, get_spec(voice), jitter_seed=seed)
    g_c = native_oracle_dsp_chain(pel, get_spec(voice), jitter_seed=seed)
    assert g_c is not None and _bits_equal(g_py, g_c)


def test_native_twin_bitexact_resampled():
    import dataclasses
    for rate in (22050.0, 48000.0):
        spec = dataclasses.replace(get_spec("generic"), sample_rate=rate)
        voice = get_voice("generic").resampled(rate)
        pel = text_to_phoneme_elems("aei", voice,
                                    lang_mod.get_language("generic"))
        assert _bits_equal(oracle_dsp_chain(pel, spec, jitter_seed=1),
                           native_oracle_dsp_chain(pel, spec, jitter_seed=1))


def test_native_twin_silence_only_and_empty():
    spec = get_spec("generic")
    pel = _pelems("ppp")  # all Silence: exercises the silent-blend cases
    assert _bits_equal(oracle_dsp_chain(pel, spec),
                       native_oracle_dsp_chain(pel, spec))
    assert len(native_oracle_dsp_chain([], spec)) == 0


def test_native_twin_zero_blend_corner():
    # blend_length == 0: time/0 -> NaN, Rust f32::min(NaN, 1) == 1 holds the
    # CURRENT element (reference src/lib.rs:899); both oracles pin it
    spec = get_spec("generic")
    pel = [PhonemeElem(Phoneme.A, 0.05, 0.0, 0.003),
           PhonemeElem(Phoneme.E, 0.05, 0.0, 0.003)]
    g_py = oracle_dsp_chain(pel, spec, jitter_seed=2)
    g_c = native_oracle_dsp_chain(pel, spec, jitter_seed=2)
    assert _bits_equal(g_py, g_c)


def test_native_twin_rejects_nonfinite_length():
    spec = get_spec("generic")
    pel = [PhonemeElem(Phoneme.A, float("nan"), 0.1, 0.003)]
    with pytest.raises(ValueError, match="non-finite"):
        native_oracle_dsp_chain(pel, spec)
    with pytest.raises(ValueError, match="non-finite"):
        native_oracle_dsp_chain(
            [PhonemeElem(Phoneme.A, float("inf"), 0.1, 0.003)], spec)


def test_native_twin_fuzz_random_scores():
    # randomized scores hit element-presence combinations the corpus never
    # does: specials adjacent to sounds, blend > length, zero-length
    # elements (one sample each in both state machines), extreme pitches
    rng = np.random.default_rng(0xC0FFEE)
    spec = get_spec("plain")
    sounds = [p for p in Phoneme if p.name not in ("SILENCE", "STOP", "GLIDE")]
    specials = [Phoneme.SILENCE, Phoneme.STOP]
    for case in range(20):
        pel = []
        for _ in range(int(rng.integers(1, 8))):
            pool = specials if rng.random() < 0.3 else sounds
            length = float(rng.choice(
                [0.0, 0.011, 0.02 + 0.05 * rng.random()],
                p=[0.15, 0.35, 0.5]))
            blend = float(rng.choice(
                [0.0, 0.01 * rng.random(), 0.2 * rng.random()],
                p=[0.1, 0.5, 0.4]))
            freq = float(rng.choice([0.0005, 0.003, 0.02, 0.4]))
            pel.append(PhonemeElem(pool[int(rng.integers(len(pool)))],
                                   length, blend, freq))
        seed = int(rng.integers(0, 2**32))
        g_py = oracle_dsp_chain(pel, spec, jitter_seed=seed)
        g_c = native_oracle_dsp_chain(pel, spec, jitter_seed=seed)
        assert _bits_equal(g_py, g_c), (case, pel, seed)


def test_gold_dsp_chain_routes_native():
    # gold_dsp_chain must agree with the Python oracle whichever branch runs
    spec = get_spec("generic")
    pel = _pelems("ae")
    assert _bits_equal(gold_dsp_chain(pel, spec, jitter_seed=5),
                       oracle_dsp_chain(pel, spec, jitter_seed=5))
