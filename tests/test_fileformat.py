"""Declarative voice/language JSON files (reference roadmap README.md:17)."""

import json

import numpy as np

from grail_tpu.api import synthesize
from grail_tpu.languages import get_language
from grail_tpu.languages.fileformat import (language_from_dict,
                                            language_to_dict,
                                            load_language_file,
                                            save_language_file)
from grail_tpu.voices import get_voice
from grail_tpu.voices.fileformat import (load_voice_file, save_voice_file,
                                         spec_from_dict, spec_to_dict)
from grail_tpu.voices.preset_generic import SPEC


def test_voice_file_roundtrip(tmp_path):
    path = str(tmp_path / "v.json")
    save_voice_file(path, SPEC)
    v = load_voice_file(path)
    ref = get_voice("generic")
    np.testing.assert_array_equal(np.asarray(v.table.formant_freq),
                                  np.asarray(ref.table.formant_freq))
    np.testing.assert_array_equal(np.asarray(v.defined),
                                  np.asarray(ref.defined))
    assert v.center_frequency == ref.center_frequency
    assert v.jitter_frequency == ref.jitter_frequency


def test_voice_spec_dict_is_json_stable():
    doc = spec_to_dict(SPEC)
    doc2 = spec_to_dict(spec_from_dict(json.loads(json.dumps(doc))))
    assert doc == doc2


def test_language_file_roundtrip(tmp_path):
    path = str(tmp_path / "l.json")
    en = get_language("english")
    save_language_file(path, en)
    lang = load_language_file(path)
    assert lang.rules == en.rules
    assert lang.case_sensitive == en.case_sensitive
    assert lang.intonation == en.intonation


def test_file_voice_synthesizes(tmp_path):
    vpath = str(tmp_path / "v.json")
    lpath = str(tmp_path / "l.json")
    save_voice_file(vpath, SPEC)
    save_language_file(lpath, get_language("generic"))
    v = load_voice_file(vpath)
    lang = load_language_file(lpath)
    a = synthesize("aeae", v, lang)
    b = synthesize("aeae", "generic", "generic")
    np.testing.assert_array_equal(a, b)


def test_cli_accepts_voice_file(tmp_path, capsys):
    from grail_tpu.cli import main

    vpath = str(tmp_path / "v.json")
    save_voice_file(vpath, SPEC)
    out = str(tmp_path / "o.wav")
    assert main(["-s", "-v", vpath, "-o", out, "ae"]) == 0
    assert (tmp_path / "o.wav").exists()
    # malformed files -> clean error, exit 1 (empty document, not-JSON,
    # structurally wrong types must all avoid tracebacks)
    bad = str(tmp_path / "bad.json")
    with open(bad, "w") as fh:
        fh.write("{}")
    assert main(["-s", "-v", bad, "ae"]) == 1  # no phonemes defined
    with open(bad + "2", "w") as fh:
        fh.write("not json")
    assert main(["-s", "-v", bad + "2", "ae"]) == 1
    with open(bad + "3", "w") as fh:
        fh.write('{"phonemes": {"A": {"freq": 1.0}}}')  # scalar table
    assert main(["-s", "-v", bad + "3", "ae"]) == 1
    badl = str(tmp_path / "badl.json")
    with open(badl, "w") as fh:
        fh.write('{"intonation": {"bogus_key": 1}}')
    assert main(["-s", "-l", badl, "ae"]) == 1
