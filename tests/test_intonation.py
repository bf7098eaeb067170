"""Rule-driven intonation (the reference's roadmap intonator).

Reference: the Intonator stub (src/lib.rs:1047-1089) with TODOs at
:1062-1066 and the roadmap "lookahead based intonation ruleset"
(README.md:15). Contour mode segments text into clauses at punctuation and
applies the LANGUAGE's IntonationRules; stub mode stays exactly the
reference's fixed 0.5 s / 0.5 s / center-frequency output.
"""

import numpy as np

from grail_tpu.languages import get_language
from grail_tpu.text.intonate import intonate, split_clauses
from grail_tpu.text.phonemes import Phoneme
from grail_tpu.text.transcribe import transcribe
from grail_tpu.voices import get_voice


V = get_voice("plain")
EN = get_language("english")


def _final_vowel_freqs(pelems, n=2):
    from grail_tpu.text.phonemes import is_sound

    fs = [pe.frequency for pe in pelems if is_sound(pe.phoneme)]
    return fs[-n:]


def test_stub_parity_unchanged():
    ph = transcribe("hello", EN)
    for pe in intonate(ph, EN, V, contour=False):
        assert pe.length == 0.5 and pe.blend_length == 0.5
        assert pe.frequency == float(V.center_frequency)


def test_question_rises_statement_falls():
    ph = transcribe("are you there", EN)
    q = intonate(ph, EN, V, contour=True, clause="question")
    s = intonate(ph, EN, V, contour=True, clause="statement")
    cf = float(V.center_frequency)
    fq = np.mean(_final_vowel_freqs(q))
    fs = np.mean(_final_vowel_freqs(s))
    # the boundary tone is local: a question's finals rise clearly above a
    # statement's, which fall below the declination trend and center
    assert fq > fs * 1.2
    assert fs < cf * 0.9
    assert fq > cf * 0.95
    # identical except the boundary tone region
    assert all(a.length == b.length for a, b in zip(q, s))


def test_split_clauses_punctuation():
    cl = split_clauses("hello, world. are you there? yes!")
    assert cl == [("hello", "statement", "comma"),
                  ("world", "statement", "sentence"),
                  ("are you there", "question", "sentence"),
                  ("yes", "exclamation", "sentence")]
    assert split_clauses("no punctuation") == \
        [("no punctuation", "statement", None)]


def test_text_to_score_inserts_pauses_and_rise():
    from grail_tpu.api import text_to_score

    plain = text_to_score("hello world", "plain", "english", contour=True)
    comma = text_to_score("hello, world", "plain", "english", contour=True)
    # the comma adds one silent pause element
    n_sil_plain = int(np.sum(~np.asarray(plain.has_sound)
                             & (np.asarray(plain.length) > 0)))
    n_sil_comma = int(np.sum(~np.asarray(comma.has_sound)
                             & (np.asarray(comma.length) > 0)))
    assert n_sil_comma == n_sil_plain + 1

    stmt = text_to_score("are you there.", "plain", "english", contour=True)
    ques = text_to_score("are you there?", "plain", "english", contour=True)
    f_s = np.asarray(stmt.elem.frequency)[np.asarray(stmt.has_sound)]
    f_q = np.asarray(ques.elem.frequency)[np.asarray(ques.has_sound)]
    assert f_q[-1] > f_s[-1] * 1.1   # boundary tone differs


def test_language_rules_differ():
    es = get_language("espanol")
    ph = transcribe("aeiou", EN)
    en_el = intonate(ph, EN, V, contour=True)
    es_el = intonate(ph, es, V, contour=True)
    f_en = [pe.frequency for pe in en_el]
    f_es = [pe.frequency for pe in es_el]
    assert f_en != f_es   # per-language prosody actually drives the contour


def test_contour_synthesizes():
    # end-to-end: contoured text with punctuation through the full pipeline
    from grail_tpu.api import synthesize

    audio = synthesize("hello, are you there?", "plain", "english",
                       contour=True)
    assert np.isfinite(audio).all()
    assert np.abs(audio).max() > 0.01
