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
    # (the session seeds the frontend's reference-parity leading Silence)
    eng = languages.get_language("english")
    whole = [Phoneme.SILENCE] + list(transcribe_chars("push it", eng))

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


def test_zero_blend_exact_grid_hit_holds_current():
    """The reference's zero-blend NaN corner (src/lib.rs:899): at a sample
    where time == 0.0 EXACTLY, alpha = (0/0).min(1) and Rust f32::min(NaN, 1)
    = 1 — the CURRENT element is held, it does not switch one sample early.
    A one-sample element of length exactly 1/sr pins the corner: the oracle
    countdown lands time == 0.0 on its entry sample."""
    import jax

    from grail_tpu.oracle import reference as orc
    from grail_tpu.synth.score import score_from_phoneme_elems
    from grail_tpu.synth.sequencer import expand_score
    from grail_tpu.text.intonate import PhonemeElem
    from grail_tpu.voices import get_voice
    from grail_tpu.voices.preset_generic import SPEC

    sr = 44100.0
    dt = float(np.float32(np.float32(1.0) / np.float32(sr)))
    v = get_voice("generic")
    nv = orc.NpVoice.from_spec(SPEC)
    pel = [PhonemeElem(Phoneme.A, dt, 0.0, v.center_frequency),
           PhonemeElem(Phoneme.E, 0.05, 0.0, v.center_frequency)]

    seq = orc.oracle_select(pel, nv)
    gold = list(orc.oracle_sequence(seq, sr))
    a_row = nv.get(Phoneme.A).formant_freq
    # pre-fix this sample was all-NaN (Python min propagates NaN)
    assert np.all(np.isfinite(gold[0].formant_freq))
    np.testing.assert_array_equal(gold[0].formant_freq, a_row)

    score = score_from_phoneme_elems(pel, v)
    elems, valid = jax.jit(lambda s: expand_score(s, sr, 4096))(score)
    N = int(np.asarray(valid).sum())
    assert N == len(gold)
    got = np.asarray(elems.formant_freq)[:N]
    goldf = np.stack([g.formant_freq for g in gold])
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, goldf, atol=1e-6)


def test_rust_min_nan_semantics():
    from grail_tpu.oracle.reference import _rust_min

    nan = np.float32("nan")
    assert _rust_min(nan, np.float32(1.0)) == np.float32(1.0)
    assert _rust_min(np.float32(2.0), nan) == np.float32(2.0)
    assert _rust_min(np.float32(3.0), np.float32(1.0)) == np.float32(1.0)


def test_zero_blend_boundary_avoids_device_grid():
    """score.py steers zero-blend elements' cumulative f32 time OFF the
    device sample grid (c != f32(f32(k)*dt)) so t > 0 at every in-element
    sample and min(t/eps, 1) = 1 reproduces the reference's NaN->hold with
    zero device cost. Hunt a cumulative time where the mid-bin target DOES
    collide (f32 ulp > half a sample bin: ~95..190 s) and check the nudge."""
    from grail_tpu.synth.score import _lengths_hitting_boundaries

    sr32 = np.float32(44100.0)
    dt = np.float32(np.float32(1.0) / sr32)

    def hit(c, n):
        return any(np.float32(np.float32(k) * dt) == c
                   for k in range(max(1, n - 3), n + 1))

    found = resolved = 0
    for n in range(5_000_000, 8_300_000, 997):
        plain = _lengths_hitting_boundaries(np.asarray([n]), 44100.0)
        c = np.float32(plain[0])          # single element: cumsum == length
        if int(np.floor(c * sr32)) != n or not hit(c, n):
            continue
        found += 1
        fixed = _lengths_hitting_boundaries(
            np.asarray([n]), 44100.0, zero_blend=np.asarray([True]))
        cf = np.float32(fixed[0])
        # boundary exactness ALWAYS wins
        assert int(np.floor(cf * sr32)) == n, n
        up = np.nextafter(c, np.float32(np.inf), dtype=np.float32)
        down = np.nextafter(c, np.float32(-np.inf), dtype=np.float32)
        alternative = (int(np.floor(up * sr32)) == n
                       or int(np.floor(down * sr32)) == n)
        if alternative:
            # another representable value exists in the bin: must be used
            assert not hit(cf, n), n
            resolved += 1
        else:
            # the bin holds ONLY the grid value (f32 ulp ~ bin width):
            # the corner is unrepresentable; boundary must be untouched
            assert cf == c, n
        if found >= 12:
            break
    assert found, "no colliding boundary found in the scanned range"
    del resolved  # collisions in >=2-value bins can't arise from mid-bin
    #              targeting; the nudge branch is defense-in-depth


def test_drift_sim_stall_raises_both_impls():
    # a single >256s element makes the reference's f32 countdown t -= dt a
    # no-op (dt below half an ulp of t): the crossing is unreachable and
    # both drift-sim twins must raise instead of hanging the host
    from grail_tpu.synth.score import (_reference_boundary_samples,
                                       _reference_boundary_samples_np)

    for fn in (_reference_boundary_samples, _reference_boundary_samples_np):
        with pytest.raises(ValueError, match="stalls"):
            fn(np.asarray([600.0], np.float32), 44100.0)
    # long-but-fine elements still work and the twins stay bit-identical
    a = _reference_boundary_samples(np.asarray([100.0, 0.5], np.float32), 44100.0)
    b = _reference_boundary_samples_np(np.asarray([100.0, 0.5], np.float32), 44100.0)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_negative_time_alpha_clamped():
    # s_k = f32(k1)*dt can round ABOVE an element's f32 cumulative end time
    # while the integer boundary still selects the element -> t < 0. With a
    # zero-blend element's 1e-12 epsilon, the unclamped alpha was ~ -1e7 (a
    # full-scale one-sample parameter explosion); alpha must clamp to 0.
    import jax.numpy as jnp

    from grail_tpu.synth.score import Score
    from grail_tpu.synth.sequencer import expand_score
    from grail_tpu.voices import get_voice

    sr = np.float32(44100.0)
    dt = np.float32(np.float32(1.0) / sr)
    found = None
    for n in range(1000, 2_000_000, 7):
        s_n = np.float32(np.float32(n) * dt)
        L = np.nextafter(s_n, np.float32(0), dtype=np.float32)
        if int(np.floor(L * sr)) >= n:      # element still selected at n
            found = (n, L)
            break
    assert found, "no negative-t sample found in scan range"
    n, L = found

    voice = get_voice("generic")
    rows = [voice.table[0], voice.table[1]]   # DISTINCT rows ('A' then 'E'):
    # identical rows would cancel the alpha term (cur*a + nxt*(1-a) == cur)
    elem2 = type(rows[0])(*(np.stack([np.asarray(f) for f in fs])
                            for fs in zip(*rows)))
    score = Score.build(elem=elem2._replace(
                      frequency=np.asarray([0.003, 0.006], np.float32)),
                  has_sound=np.asarray([True, True]),
                  length=jnp.asarray([float(L), 0.5], jnp.float32),
                  blend_length=jnp.asarray([1e-12, 0.5], jnp.float32))
    elems, valid = expand_score(score, float(sr), 8, offset=n - 4)
    amp = np.asarray(elems.formant_amp)
    assert np.isfinite(amp).all()
    assert np.abs(amp).max() <= 1.5, np.abs(amp).max()
