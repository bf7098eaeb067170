"""Regression tests for code-review findings (round 1 self-review)."""

import numpy as np
import pytest

from grail_tpu import languages
from grail_tpu.runtime.stream import StreamSession
from grail_tpu.text.language import Language
from grail_tpu.text.phonemes import Phoneme
from grail_tpu.text.transcribe import transcribe_chars, transcribe_partial
from grail_tpu.utils import sample_error_db


def test_read_partial_blocks_are_gapfree():
    # finding 1: read() must not drop the unserved tail of a block
    s1 = StreamSession(seed=0, block=1024)
    s1.feed("aeae")
    s1.flush()
    a = np.concatenate([s1.read(512), s1.read(700), s1.read(44100 - 1212)])

    s2 = StreamSession(seed=0, block=1024)
    s2.feed("aeae")
    s2.flush()
    b = s2.read(44100)
    np.testing.assert_array_equal(a, b)


def test_feed_boundary_does_not_split_digraphs():
    # finding 2: a multi-char rule straddling feed boundaries must still match
    eng = languages.get_language("english")
    whole = list(transcribe_chars("push it", eng))

    s = StreamSession(voice="plain", language="english")
    for piece in ("pu", "sh", " ", "i", "t"):
        s.feed(piece)
    s.flush()
    streamed = [pe.phoneme for pe in s._elements]
    assert streamed == whole


def test_transcribe_partial_resume_invariant():
    # partial(text) + automaton(rest) == automaton(text) for any split point
    eng = languages.get_language("english")
    for text in ("push it", "the quick brown fox", "aaa", "chchch", "x[y]z!"):
        full = list(transcribe_chars(text, eng))
        emitted, consumed = transcribe_partial(text, eng)
        rest = list(transcribe_chars(text[consumed:], eng))
        assert emitted + rest == full, text


def test_transcribe_partial_holds_extendable_match():
    # "a" could extend to "aa" with more input -> held back entirely
    l = Language.from_pairs([("a", [Phoneme.A]), ("aa", [Phoneme.E])])
    emitted, consumed = transcribe_partial("a", l)
    assert emitted == [] and consumed == 0
    emitted, consumed = transcribe_partial("aaa", l)
    # "aa" is final (range collapsed), trailing "a" held
    assert emitted == [Phoneme.E] and consumed == 2


def test_batch_sample_rate_resamples_voice():
    # finding 3: synthesize_batch must retarget voices like synthesize()
    from grail_tpu.api import synthesize, synthesize_batch

    single = synthesize("ae", sample_rate=22050.0)
    batched = synthesize_batch(["ae"], sample_rate=22050.0, backend="xla")[0]
    assert sample_error_db(batched, single) < -100


def test_native_cache_keyed_by_content():
    # finding 4: two distinct Language objects with different rules must not
    # share a cached native ruleset
    from grail_tpu.runtime import native

    if not native.available():
        pytest.skip("native library not built")
    la = Language.from_pairs([("a", [Phoneme.A])])
    ra = native.native_transcribe("a", la)
    del la
    lb = Language.from_pairs([("a", [Phoneme.E])])
    rb = native.native_transcribe("a", lb)
    assert ra == [Phoneme.A] and rb == [Phoneme.E]


def test_zero_blend_length_holds_parameters():
    # finding 5: blend_length=0 means hold-until-boundary (reference: t/0=inf,
    # alpha clamps to 1), not a one-second crossfade
    import jax

    from grail_tpu.synth.score import score_from_phoneme_elems
    from grail_tpu.synth.sequencer import expand_score
    from grail_tpu.text.intonate import PhonemeElem
    from grail_tpu.voices import get_voice

    v = get_voice("generic")
    pel = [PhonemeElem(Phoneme.A, 0.2, 0.0, v.center_frequency),
           PhonemeElem(Phoneme.E, 0.2, 0.0, v.center_frequency)]
    score = score_from_phoneme_elems(pel, v)
    elems, valid = jax.jit(lambda s: expand_score(s, 44100.0, 16384))(score)
    ff = np.asarray(elems.formant_freq)
    n1 = int(0.2 * 44100)
    a_row = np.asarray(v.table.formant_freq)[0]
    e_row = np.asarray(v.table.formant_freq)[1]
    # mid-element samples hold pure A then pure E — no blending anywhere
    np.testing.assert_allclose(ff[10], a_row, atol=1e-6)
    np.testing.assert_allclose(ff[n1 - 10], a_row, atol=1e-6)
    np.testing.assert_allclose(ff[n1 + 10], e_row, atol=1e-6)


def test_native_python_transcriber_utf8_parity():
    """The native automaton walks BYTES; an unmatched multi-byte UTF-8
    char must still emit ONE silence like the char-walking Python/Rust
    automaton (continuation bytes are skipped in the garbage path)."""
    from grail_tpu.runtime import native
    from grail_tpu.text.transcribe import transcribe_chars

    if not native.available():
        pytest.skip("native library not built")
    for lname in ("deutsch", "espanol", "english", "francais", "generic"):
        lang = languages.get_language(lname)
        rs = native.NativeRuleset(lang)
        for text in ("straße grün", "¿qué chica?", "日本語 🎵 ñ", "¿¡aä!?"):
            assert rs.transcribe(text) == list(transcribe_chars(text, lang)), \
                (lname, text)
