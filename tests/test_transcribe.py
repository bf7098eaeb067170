"""Transcriber behavior tests.

The first six tests are golden behavior specs ported from the reference's
only substantive test suite (/root/reference/src/lib.rs:1210-1358); they pin
the greedy longest-prefix-match automaton exactly.
"""

from grail_tpu.text.language import Language
from grail_tpu.text.phonemes import Phoneme
from grail_tpu.text.transcribe import transcribe, transcribe_chars
from grail_tpu import languages

A, E, S = Phoneme.A, Phoneme.E, Phoneme.SILENCE


def lang(pairs):
    return Language.from_pairs(pairs)


def run(text, language):
    return list(transcribe_chars(text, language))


def test_transcribe_unique():
    # reference src/lib.rs:1210-1231
    l = lang([("ab", [A]), ("c", [E])])
    assert run("abc", l) == [A, E]


def test_transcribe_same_start():
    # reference src/lib.rs:1233-1255
    l = lang([("ab", [A]), ("ac", [E])])
    assert run("abacab", l) == [A, E, A]


def test_transcribe_same_char_different_length():
    # reference src/lib.rs:1257-1279: longest match wins
    l = lang([("a", [A]), ("aa", [E])])
    assert run("aaa", l) == [E, A]


def test_transcribe_same_char_different_length_cutoff():
    # reference src/lib.rs:1282-1308: falls back to the shorter rule
    l = lang([("a", [A]), ("aa", [E]), ("e", [E])])
    assert run("ae", l) == [A, E]


def test_transcribe_skip_no_matches():
    # reference src/lib.rs:1310-1333: garbage emits Silence and is consumed
    l = lang([("ab", [A]), ("ac", [E])])
    assert run("abuac", l) == [A, S, E]


def test_transcribe_skip_partial_match_at_end():
    # reference src/lib.rs:1335-1358: dangling partial match -> Silence
    l = lang([("ab", [A]), ("ac", [E])])
    assert run("abaca", l) == [A, E, S]


# ---- behaviors beyond the reference's tests ------------------------------

def test_dead_end_swallows_prefix():
    # a partial match that dead-ends consumes the whole prefix plus the
    # breaking char into ONE silence (no backtracking) — matches the
    # reference automaton's behavior on e.g. rules {ab}, input "ac".
    l = lang([("ab", [A])])
    assert run("ac", l) == [S]


def test_multi_phoneme_rules_buffered():
    g = languages.generic()
    assert run("oui", g) == [A, E, A]
    assert run("ii", g) == [E, A]


def test_generic_language_rules():
    g = languages.generic()
    assert run("a", g) == [A]
    assert run("e", g) == [E]
    assert run("i", g) == [A]
    assert run("p", g) == [S]
    assert run("z", g) == [S]


def test_case_insensitive():
    g = languages.generic()
    assert run("AeI", g) == [A, E, A]


def test_case_sensitive():
    l = Language.from_pairs([("a", [A])], case_sensitive=True)
    assert run("A", l) == [S]
    assert run("a", l) == [A]


def test_leading_silence_pipeline_quirk():
    # The public .transcribe() entry point seeds the buffer with [Silence]
    # (reference src/lib.rs:1197-1204) -> leading SILENCE phoneme.
    g = languages.generic()
    assert transcribe("a", g) == [S, A]
    assert transcribe("a", g, leading_silence=False) == [A]


def test_rules_sorted_on_construction():
    l = Language.from_pairs([("c", [E]), ("ab", [A])])
    assert [r.string for r in l.rules] == ["ab", "c"]
    assert run("abc", l) == [A, E]


def test_empty_input():
    assert run("", languages.generic()) == []
