"""Full-inventory configs: every phoneme synthesizes; english ruleset;
Glide/Stop semantics; contour intonator; resampling."""

import numpy as np
import pytest

from grail_tpu import languages
from grail_tpu.api import synthesize, synthesize_score, text_to_score
from grail_tpu.synth.score import score_from_phoneme_elems
from grail_tpu.text.intonate import PhonemeElem, intonate
from grail_tpu.text.phonemes import SOUND_PHONEMES, Phoneme, sound_index
from grail_tpu.text.transcribe import transcribe
from grail_tpu.voices import get_voice


def test_plain_voice_covers_full_inventory():
    v = get_voice("plain")
    defined = np.asarray(v.defined)
    missing = [p.name for p in SOUND_PHONEMES if not defined[sound_index(p)]]
    assert not missing, f"undefined phonemes: {missing}"


@pytest.mark.parametrize("phoneme", [p.name for p in SOUND_PHONEMES])
def test_every_phoneme_synthesizes(phoneme):
    v = get_voice("plain")
    pel = [PhonemeElem(Phoneme[phoneme], 0.12, 0.03, v.center_frequency)]
    score = score_from_phoneme_elems(pel, v)
    a = synthesize_score(score, v)
    assert np.isfinite(a).all()
    assert np.max(np.abs(a)) <= 1.0
    assert np.max(np.abs(a)) > 1e-4  # actually makes sound


def test_english_digraphs():
    eng = languages.get_language("english")
    assert [p.name for p in transcribe("sh", eng, leading_silence=False)] == ["SH"]
    assert [p.name for p in transcribe("thing", eng, leading_silence=False)] == \
        ["TH", "IH", "NG"]
    assert [p.name for p in transcribe("day", eng, leading_silence=False)] == \
        ["STOP", "D", "EH", "GLIDE", "IH"]


def test_plosives_emit_stop_closure():
    eng = languages.get_language("english")
    out = [p.name for p in transcribe("pa", eng, leading_silence=False)]
    assert out == ["STOP", "P", "AE"]


def test_glide_merges_elements():
    v = get_voice("plain")
    pel = [
        PhonemeElem(Phoneme.EH, 0.2, 0.05, v.center_frequency),
        PhonemeElem(Phoneme.GLIDE, 0.1, 0.05, v.center_frequency),
        PhonemeElem(Phoneme.IH, 0.2, 0.05, v.center_frequency),
    ]
    score = score_from_phoneme_elems(pel, v)
    # glide merged into EH: two elements remain
    assert int(np.asarray(score.has_sound).sum()) == 2
    a = synthesize_score(score, v)
    # no silence dip in the middle (seamless diphthong blend)
    sr = 44100
    mid = a[int(0.15 * sr):int(0.35 * sr)]
    rms_win = np.sqrt(np.convolve(mid.astype(np.float64) ** 2,
                                  np.ones(512) / 512, mode="valid"))
    assert rms_win.min() > 0.2 * rms_win.max()


def test_contour_pitch_declines():
    v = get_voice("plain")
    phon = [Phoneme.A] * 8
    pel = intonate(phon, None, v, contour=True)
    freqs = [p.frequency for p in pel]
    assert freqs[-1] < freqs[0]  # declination + final fall


def test_whole_sentence_english():
    a = synthesize("the quick brown fox", voice="plain", language="english",
                   contour=True)
    assert np.isfinite(a).all() and np.max(np.abs(a)) <= 1.0
    assert len(a) > 44100  # non-trivial sentence length


def test_espanol_language():
    es = languages.get_language("espanol")
    assert [p.name for p in transcribe("hola", es, leading_silence=False)] == \
        ["O", "L", "A"]  # silent h
    assert [p.name for p in transcribe("chica", es, leading_silence=False)] == \
        ["STOP", "T", "SH", "I", "STOP", "K", "A"]
    a = synthesize("buenos dias", voice="plain", language="espanol", contour=True)
    assert np.isfinite(a).all() and np.max(np.abs(a)) <= 1.0


def test_deutsch_language():
    de = languages.get_language("deutsch")
    assert [p.name for p in transcribe("schule", de, leading_silence=False)] == \
        ["SH", "U", "L", "EH"]
    assert [p.name for p in transcribe("zeit", de, leading_silence=False)] == \
        ["STOP", "T", "S", "AH", "GLIDE", "IH", "STOP", "T"]  # z=[ts], ei=[ai]
    # word-initial st takes [SH] via the space-prefixed rule; coda st is [s]
    assert [p.name for p in transcribe("die straße", de, leading_silence=False)] == \
        ["STOP", "D", "I", "SILENCE", "SH", "STOP", "T", "R", "A", "S", "EH"]
    assert [p.name for p in transcribe("ist", de, leading_silence=False)] == \
        ["IH", "S", "STOP", "T"]
    assert [p.name for p in transcribe("nichts", de, leading_silence=False)] == \
        ["N", "IH", "H", "STOP", "T", "S"]  # prefix-closure: final [ts]
    # the " s" fallback must not shadow the space-prefixed sch/sp/st rules
    assert [p.name for p in transcribe("die schule", de, leading_silence=False)] == \
        ["STOP", "D", "I", "SILENCE", "SH", "U", "L", "EH"]
    assert [p.name for p in transcribe("die sonne", de, leading_silence=False)][:5] == \
        ["STOP", "D", "I", "SILENCE", "Z"]
    a = synthesize("guten morgen", voice="plain", language="deutsch",
                   contour=True)
    assert np.isfinite(a).all() and np.max(np.abs(a)) <= 1.0


def test_francais_language():
    fr = languages.get_language("francais")
    assert [p.name for p in transcribe("bonjour", fr, leading_silence=False)] == \
        ["STOP", "B", "O", "N", "ZH", "U", "R"]
    assert [p.name for p in transcribe("château", fr, leading_silence=False)] == \
        ["SH", "A", "STOP", "T", "O"]  # ch=[sh], eau=[o], accented â
    a = synthesize("merci beaucoup", voice="plain", language="francais",
                   contour=True)
    assert np.isfinite(a).all() and np.max(np.abs(a)) <= 1.0


def test_rulesets_are_prefix_closed():
    """The reference automaton has NO backtracking: when a longer rule's
    candidacy breaks, it falls back only to a rule whose length equals the
    consumed prefix (src/lib.rs:1152-1155) — otherwise the prefix is
    swallowed into silence. Every proper prefix of every multi-char rule
    must therefore itself be a rule. (generic is exempt: it reproduces the
    reference's own 6-rule set verbatim, dead-ends included.)"""
    for name in languages.language_names():
        if name == "generic":
            continue
        lang = languages.get_language(name)
        strings = {r.string for r in lang.rules}
        for r in lang.rules:
            for k in range(1, len(r.string)):
                assert r.string[:k] in strings, (
                    f"{name}: rule {r.string!r} lacks prefix rule "
                    f"{r.string[:k]!r} — its candidacy break swallows input")


def test_english_prefix_closure_words():
    en = languages.get_language("english")
    assert [p.name for p in transcribe("time", en, leading_silence=False)] == \
        ["STOP", "T", "IH", "M", "EH"]
    assert [p.name for p in transcribe("big", en, leading_silence=False)] == \
        ["STOP", "B", "IH", "STOP", "G"]
    es = languages.get_language("espanol")
    assert [p.name for p in transcribe("guapo", es, leading_silence=False)] == \
        ["STOP", "G", "U", "A", "STOP", "P", "O"]


def test_voice_variants_differ():
    from grail_tpu.utils import sample_error_db

    outs = {n: synthesize("aeae", voice=n, seed=1)
            for n in ("plain", "bright", "deep", "whisper")}
    names = list(outs)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            assert sample_error_db(outs[names[i]], outs[names[j]]) > -30, \
                (names[i], names[j])


def test_resampled_voice():
    # reference resampling capability (src/lib.rs:20-21, 418-440) + the
    # synthesize_resampled placeholder: similar output at a new sample rate
    a44 = synthesize("aeae")
    a22 = synthesize("aeae", sample_rate=22050.0)
    assert abs(len(a44) / 2 - len(a22)) < 20

    # formants must sit at the same PHYSICAL frequencies after resampling:
    # compare normalized magnitude spectra of the first 'a' vowel in Hz
    def spectrum_hz(x, sr, grid):
        X = np.abs(np.fft.rfft(x.astype(np.float64) * np.hanning(len(x))))
        f = np.fft.rfftfreq(len(x), 1 / sr)
        X = X / (np.linalg.norm(X) + 1e-12)
        return np.interp(grid, f, X)

    grid = np.linspace(100, 4000, 400)
    seg44 = a44[int(0.6 * 44100):int(0.9 * 44100)]
    seg22 = a22[int(0.6 * 22050):int(0.9 * 22050)]
    s44 = spectrum_hz(seg44, 44100, grid)
    s22 = spectrum_hz(seg22, 22050, grid)
    corr = np.dot(s44, s22) / (np.linalg.norm(s44) * np.linalg.norm(s22))
    assert corr > 0.7, corr  # fine structure differs (jitter realization)
    # dominant formant peak at the same physical frequency
    assert abs(grid[np.argmax(s44)] - grid[np.argmax(s22)]) < 100
