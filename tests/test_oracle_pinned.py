"""Repo-pinned oracle waveform hashes: a cross-round tamper-evident anchor.

Every fidelity verdict in this repo is measured against the self-authored
oracle (no rustc exists here to run the real grail-rs). Two defenses keep
that oracle honest: the independently written C++ twin must agree
bit-for-bit (tests/test_native_oracle.py), and these SHA-256 pins freeze
the agreed waveform bits so an accidental semantic change to BOTH
implementations in a later round (e.g. a shared misreading applied twice)
still trips a loud failure instead of silently moving the goalposts.

If a pin ever fails legitimately (a deliberate, documented semantics fix),
re-derive it with the snippet in the module docstring of
grail_tpu/oracle/native.py and record the reason in the commit message.
"""

import hashlib

import pytest

from grail_tpu import languages as lang_mod
from grail_tpu.api import text_to_phoneme_elems
from grail_tpu.oracle import gold_dsp_chain
from grail_tpu.voices import get_spec, get_voice

# (text, voice, language, contour, jitter_seed) -> (n_samples, sha256[:32])
PINS = {
    ("aeae", "generic", "generic", False, 0):
        (110238, "e27df9b492101a88ac63f35c956a8397"),
    ("hello", "plain", "english", False, 0):
        (132285, "f8f3401134f0e865a26173e52e82c3eb"),
    ("say hi", "plain", "english", False, 7):
        (176408, "2376e4783051bba331c6bec6bba9ddde"),
    ("guten tag", "plain", "deutsch", False, 0):
        (308666, "410013d0e60305e1db6364dcdebe3f63"),
    ("hello there, how are you today? fine thanks.",
     "plain", "english", True, 3):
        (290953, "d8ae98f85a614b0bba01227984333424"),
}


@pytest.mark.parametrize("case", list(PINS), ids=lambda c: c[0][:12])
def test_oracle_waveform_pinned(case):
    text, vname, lname, contour, seed = case
    pel = text_to_phoneme_elems(text, get_voice(vname),
                                lang_mod.get_language(lname), contour=contour)
    g = gold_dsp_chain(pel, get_spec(vname), jitter_seed=seed)
    n, digest = PINS[case]
    assert len(g) == n
    assert hashlib.sha256(g.tobytes()).hexdigest()[:32] == digest
