"""Regression tests for the round-3 review of the text frontend + app layer:
clause-typed contour in streaming sessions, digit-aware clause splitting,
REPL drain-on-error, and CLI voice-native sample rates."""

import dataclasses
import subprocess
import sys

import numpy as np
import pytest

from grail_tpu.api import text_to_phoneme_elems
from grail_tpu.runtime.stream import StreamSession
from grail_tpu.synth.score import merge_glides
from grail_tpu.text.intonate import split_clauses, split_clauses_partial


def test_split_clauses_digit_guard():
    # '.', ':' and ';' between digits are not clause boundaries
    assert split_clauses("pi is 3.14 ok") == [
        ("pi is 3.14 ok", "statement", None)]
    assert split_clauses("at 3:30, go") == [
        ("at 3:30", "statement", "comma"), ("go", "statement", None)]
    # end-of-text '.' after a digit still terminates in final mode...
    assert split_clauses("pi is 3.") == [("pi is 3", "statement", "sentence")]
    # ...but is held back in partial mode (the number may continue)
    clauses, tail = split_clauses_partial("value 3.")
    assert clauses == [] and tail == "value 3."
    clauses, tail = split_clauses_partial("value 3." + "14 done. x")
    assert clauses == [("value 3.14 done", "statement", "sentence")]
    assert tail == " x"


def test_stream_contour_matches_oneshot_frontend():
    # the streaming session's contour prosody must equal the one-shot
    # api.text_to_phoneme_elems clause treatment (question rise, pauses),
    # regardless of how the text is chunked across feeds
    text = "Are you there? yes, fine. ok"
    want = merge_glides(text_to_phoneme_elems(
        text, voice="plain", language="english", contour=True))

    for pieces in ([text], ["Are you th", "ere? ye", "s, fine. ok"],
                   list(text)):
        s = StreamSession(voice="plain", language="english", contour=True)
        for p in pieces:
            s.feed(p)
        s.flush()
        assert s._elements == want, pieces


def test_stream_contour_question_rise():
    # audible check: '?' yields a rising final f0 vs '.' falling
    def final_f0(text):
        s = StreamSession(voice="plain", language="english", contour=True)
        s.feed(text)
        s.flush()
        a = s.read(int(s.pending_seconds * s.sample_rate))
        voiced = np.nonzero(np.abs(a) > 0.02)[0]
        end = int(voiced[-1])               # skip the clause-final pause
        x = a[end - 8000:end - 500]
        x = x - x.mean()
        ac = np.correlate(x, x, "full")[len(x) - 1:]
        lo, hi = int(s.sample_rate / 400), int(s.sample_rate / 60)
        return s.sample_rate / (lo + np.argmax(ac[lo:hi]))

    assert final_f0("are you there?") > final_f0("you are there.") * 1.08


def test_repl_drains_audio_on_command_error(tmp_path):
    # a line whose command errors must still emit the audio of the text fed
    # before the error — it was silently dropped at EOF
    out = str(tmp_path / "repl.wav")
    r = subprocess.run(
        [sys.executable, "-m", "grail_tpu.interactive", "-o", out,
         "--block", "1024"],
        input="world [x\n", capture_output=True, text=True, timeout=300,
        cwd="/root/repo")
    assert "error:" in r.stderr
    from grail_tpu.runtime.wav import load_wav

    audio, sr = load_wav(out)
    assert len(audio) / sr > 1.5          # 'world' spans ~2.5 s
    assert float(np.abs(audio).max()) > 0.05


def test_repl_rejects_bad_args(tmp_path):
    r = subprocess.run(
        [sys.executable, "-m", "grail_tpu.interactive", "-v", "nosuch"],
        input="", capture_output=True, text=True, timeout=120,
        cwd="/root/repo")
    assert r.returncode == 1
    assert "error:" in r.stderr and "Traceback" not in r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "grail_tpu.interactive", "--block", "0"],
        input="", capture_output=True, text=True, timeout=120,
        cwd="/root/repo")
    assert r.returncode == 2              # argparse usage error


def test_cli_json_voice_keeps_native_rate(tmp_path):
    # a .json voice authored at 22050 Hz must synthesize at 22050 without -r
    from grail_tpu.voices.fileformat import save_voice_file
    from grail_tpu.voices.preset_generic import SPEC
    from grail_tpu.cli import main
    from grail_tpu.runtime.wav import load_wav

    spec = dataclasses.replace(SPEC, name="gen22k", sample_rate=22050.0)
    vpath = str(tmp_path / "v22k.json")
    save_voice_file(vpath, spec)
    wav = str(tmp_path / "out.wav")
    assert main(["-s", "-v", vpath, "-o", wav, "aeae"]) == 0
    audio, sr = load_wav(wav)
    assert sr == 22050


def test_sink_chunked_buffer_roundtrip():
    # deque-of-chunks buffer: arbitrary write/pull interleavings must
    # reproduce the stream gap-free (replaces the O(backlog)-per-write
    # flat-array buffer)
    from grail_tpu.runtime.playback import CallbackSink

    rng = np.random.default_rng(3)
    sink = CallbackSink(44100.0, block=96, mode="manual")
    src = rng.standard_normal(10_000).astype(np.float32)
    fed = 0
    got = []
    # keep the producer AHEAD of the consumer (pull zero-fills on a real
    # underrun by design, which would interleave zeros into the stream)
    while fed < len(src) or sink.buffered_seconds > 0:
        while fed < len(src) and sink.buffered_seconds * 44100.0 < 1000:
            k = int(rng.integers(1, 700))
            sink.write(src[fed:fed + k])
            fed += k
        take = int(rng.integers(1, 300))
        if fed >= len(src):
            take = min(take, max(int(sink.buffered_seconds * 44100.0), 1))
        got.append(sink.pull(take))
    out = np.concatenate(got)
    assert len(out) >= len(src)
    np.testing.assert_array_equal(out[:len(src)], src)
    assert np.all(out[len(src):] == 0)


def test_load_wav_rejects_non_16bit(tmp_path):
    import struct

    payload = b"\x00" * 300
    header = b"".join([
        b"RIFF", struct.pack("<I", 36 + len(payload)), b"WAVE", b"fmt ",
        struct.pack("<IHHIIHH", 16, 1, 1, 44100, 44100 * 3, 3, 24),
        b"data", struct.pack("<I", len(payload))])
    p = tmp_path / "bad.wav"
    p.write_bytes(header + payload)
    from grail_tpu.runtime.wav import load_wav

    with pytest.raises(AssertionError, match="16-bit"):
        load_wav(str(p))


def test_drift_sim_rejects_nan_lengths():
    from grail_tpu.synth.score import (_reference_boundary_samples,
                                       _reference_boundary_samples_np)

    for fn in (_reference_boundary_samples, _reference_boundary_samples_np):
        with pytest.raises(ValueError, match="finite"):
            fn(np.asarray([0.5, np.nan, 0.5], np.float32), 44100.0)
