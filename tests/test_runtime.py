"""Streaming session, native tier, WAV I/O, CLI."""

import os
import subprocess
import sys

import numpy as np
import pytest

from grail_tpu import languages
from grail_tpu.runtime import native
from grail_tpu.runtime.stream import StreamSession
from grail_tpu.runtime.wav import encode_wav, load_wav, save_wav
from grail_tpu.text.language import Language
from grail_tpu.text.phonemes import Phoneme
from grail_tpu.text.transcribe import transcribe_chars
from grail_tpu.utils import sample_error_db


def test_stream_matches_offline():
    # vs the PRODUCTION frontend (api.synthesize): includes the reference's
    # per-utterance leading Silence (transcribe(), src/lib.rs:1197-1204) —
    # the stream emits it with the session's first real text
    from grail_tpu.api import synthesize

    offline = synthesize("aeae", exact_carrier=False)

    s = StreamSession(seed=0, block=1024)
    s.feed("aeae")
    s.flush()
    stream = s.read(len(offline))
    assert sample_error_db(stream, offline) < -60


def test_stream_idle_is_silence():
    s = StreamSession(block=1024)
    a = s.read(4096)  # nothing fed: silence elements
    assert np.max(np.abs(a)) < 1e-5


def test_stream_incremental_feed():
    s = StreamSession(block=1024)
    s.feed("a")
    s.feed("e")      # held back until enough lookahead or flush
    s.flush()
    a = s.read(30000)
    assert np.max(np.abs(a)) > 0.01  # actually made sound
    assert np.isfinite(a).all()


def test_stream_long_session_rebases():
    s = StreamSession(block=1024)
    for _ in range(12):
        s.feed("aeae ")
    s.flush()
    total = s.read(int(44100 * 2.0))
    assert np.isfinite(total).all()
    assert len(s._elements) < 80  # rebasing keeps the rolling score bounded


def test_stream_pool_matches_solo_sessions():
    # the batched serving path: one device program per tick for N sessions
    from grail_tpu.runtime.stream import StreamPool

    pool = StreamPool(4, voice="generic", language="generic", block=1024)
    pool.feed(0, "aeae")
    pool.feed(1, "ea")
    pool.flush()
    audio = np.concatenate([pool.read_block() for _ in range(30)], axis=1)

    solo = StreamSession(voice="generic", language="generic", seed=0, block=1024)
    solo.feed("aeae")
    solo.flush()
    ref = solo.read(30 * 1024)
    assert sample_error_db(audio[0], ref) < -100
    assert np.max(np.abs(audio[3])) < 1e-5  # idle session stays silent


def test_stream_live_intonation_commands():
    # the reference's planned parser stage (src/lib.rs:1366, README.md:19):
    # inline [pitch:..]/[rate:..]/[voice:..] commands steer the live stream
    s = StreamSession(voice="plain", language="english")
    s.feed("la[pitch:240]la", parse_commands=True)
    s.flush()
    # the utterance opens with the reference-parity 0.5 s leading Silence;
    # measured f0 plateaus (profiled): 120 Hz through ~0.9 s, blend to the
    # pitched element, 240 Hz plateau ~1.6-2.1 s
    a = s.read(44100 * 2 + 8000)

    def f0(x, sr=44100):
        x = x - x.mean()
        ac = np.correlate(x, x, "full")[len(x) - 1:]
        lo, hi = int(sr / 400), int(sr / 60)
        return sr / (lo + np.argmax(ac[lo:hi]))

    before = f0(a[20000:32000])
    after = f0(a[72000:90000])
    assert 100 < before < 140      # plain voice center 120 Hz
    assert 200 < after < 280       # pitched up to 240 Hz
    # rate + voice commands apply without error
    s.feed("[rate:2.0][voice:bright]la", parse_commands=True)
    s.flush()
    b = s.read(20000)
    assert np.isfinite(b).all()


def test_stream_command_parser_edge_cases():
    from grail_tpu.runtime.stream import _parse_commands

    assert _parse_commands("aa[pitch:200]ee") == [
        ("text", "aa"), ("pitch", "200"), ("text", "ee")]
    # escaping: doubled brackets are literal
    assert _parse_commands("a[[b]]c") == [("text", "a[b]c")]
    assert _parse_commands("[[lang:x]]") == [("text", "[lang:x]")]
    # a lone ']' is literal (only '[' opens a command)
    assert _parse_commands("a]b") == [("text", "a]b")]
    assert _parse_commands("") == []
    # malformed input is LOUD (silently speaking a typo'd command as text
    # hides the mistake from the author)
    for bad in ("a[pitch 200]b", "a[unclosed", "[mystery:1]", "x[:y]z"):
        with pytest.raises(ValueError):
            _parse_commands(bad)
    # colon inside the value is fine
    assert _parse_commands("[voice:a:b]") == [("voice", "a:b")]


def test_stream_command_parser_fuzz():
    """Random bracket soup must either parse into (kind, value) chunks
    whose text round-trips, or raise ValueError — never crash or drop
    characters silently."""
    import random

    from grail_tpu.runtime.stream import _parse_commands

    rng = random.Random(0)
    alphabet = "a[]:ex "
    for _ in range(500):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 20)))
        try:
            chunks = _parse_commands(s)
        except ValueError:
            continue
        for kind, val in chunks:
            assert kind in ("text", "pitch", "rate", "voice", "lang")
            assert isinstance(val, str)
    # escape round-trip: any text survives if brackets are doubled
    for _ in range(200):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 20)))
        esc = s.replace("[", "[[").replace("]", "]]")
        out = _parse_commands(esc)
        assert "".join(v for k, v in out if k == "text") == s
        assert all(k == "text" for k, _ in out)


def test_stream_lang_command_switches_language():
    s = StreamSession(voice="plain", language="english")
    before = s.language
    s.feed("hello [lang:espanol]hola ", parse_commands=True)
    s.flush()
    assert s.language is not before
    a = s.read(44100 * 2)
    assert np.isfinite(a).all() and np.max(np.abs(a)) > 0.01
    # unknown names surface as the documented ValueError (not the
    # registry's KeyError), and atomically: the buffer stays pending
    with pytest.raises(ValueError):
        s.feed("[lang:klingon]", parse_commands=True)


def test_callback_sink_underrun_accounting():
    from grail_tpu.runtime.playback import CallbackSink

    sink = CallbackSink(44100, block=100, mode="manual")
    # idle pulls before any audio: silence, NOT underruns
    assert (sink.pull() == 0).all() and sink.underruns == 0
    sink.write(np.ones(250, np.float32))
    assert (sink.pull() == 1).all()
    assert (sink.pull() == 1).all()
    # mid-stream starvation (no end() yet): underrun
    p = sink.pull()
    assert (p[:50] == 1).all() and (p[50:] == 0).all()
    assert sink.underruns == 1
    # declared end-of-utterance: the partial tail + idle pulls are clean
    sink.write(np.ones(120, np.float32))
    sink.end()
    sink.pull()
    sink.pull()
    sink.pull()
    assert sink.underruns == 1
    assert sink.stats()["pulls"] == 7


def test_callback_sink_paced_plays_realtime():
    """The mock callback sink drains a pre-written buffer on its deadline
    schedule with zero underruns (the reference's cpal pull contract,
    examples/interactive.rs:41-70, headless)."""
    import time

    from grail_tpu.runtime.playback import CallbackSink

    sink = CallbackSink(44100, block=2048, mode="paced")
    sink.write(np.zeros(8 * 2048, np.float32))
    sink.end()
    t0 = time.monotonic()
    sink.drain(timeout=5.0)
    took = time.monotonic() - t0
    st = sink.close()
    assert st["underruns"] == 0
    assert sink.buffered_seconds == 0.0
    assert took > 0.2     # actually paced (8 blocks x 46 ms), not instant


def test_cli_play_uses_mock_sink(tmp_path):
    from grail_tpu.cli import main

    out = str(tmp_path / "p.wav")
    assert main(["--play", "-o", out, "ae"]) == 0


def test_stream_checkpoint_resume_bit_exact():
    s1 = StreamSession(seed=0, block=1024)
    s1.feed("aeae")
    s1.flush()
    s1.read(20480)
    blob = s1.save_state()
    rest1 = s1.read(20480)

    s2 = StreamSession(seed=0, block=1024)
    s2.load_state(blob)
    rest2 = s2.read(20480)
    np.testing.assert_array_equal(rest1, rest2)


@pytest.mark.skipif(not native.available(), reason="native library not built")
def test_native_transcriber_matches_python():
    g = languages.generic()
    cases = ["abc", "abacab", "aaa", "ae", "abuac", "abaca", "oui", "ii",
             "AeI", "zzz", "aeae", "pp a e", ""]
    for t in cases:
        assert native.native_transcribe(t, g) == list(transcribe_chars(t, g)), t
    A, E = Phoneme.A, Phoneme.E
    l = Language.from_pairs([("a", [A]), ("aa", [E]), ("e", [E])])
    for t in ["ae", "aaa", "aae", "ea"]:
        assert native.native_transcribe(t, l) == list(transcribe_chars(t, l)), t


@pytest.mark.skipif(not native.available(), reason="native library not built")
def test_native_wav_matches_python():
    x = (np.random.default_rng(0).random(1000).astype(np.float32) * 2 - 1)
    assert native.native_encode_wav(x, 44100) == encode_wav(x, 44100)


def test_wav_roundtrip(tmp_path):
    x = np.sin(np.linspace(0, 100, 5000)).astype(np.float32) * 0.7
    p = str(tmp_path / "t.wav")
    save_wav(p, x, 44100)
    y, sr = load_wav(p)
    assert sr == 44100
    np.testing.assert_allclose(x, y, atol=1.0 / 32000)


def test_cli_writes_wav(tmp_path):
    out = str(tmp_path / "cli.wav")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; from grail_tpu.cli import main;"
         f"sys.exit(main(['-s', '-o', '{out}', 'ae']))"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr
    assert "seconds of audio" in r.stdout
    y, sr = load_wav(out)
    assert sr == 44100 and len(y) > 40000


def test_cli_help_and_version():
    from grail_tpu.cli import main
    assert main(["-h"]) == 0
    assert main(["--version"]) == 0


def test_pool_read_blocks_readahead_matches_single_ticks():
    """read_blocks(k) (one dispatch for k blocks) must match k single
    ticks; the only difference is the f32 phase handoff between calls
    (same 2^-25-cycle quantization as fused state continuation)."""
    from grail_tpu.runtime.stream import StreamPool

    def run(reader):
        pool = StreamPool(2, voice="plain", language="english", block=1024,
                          backend="fused_interpret")
        pool.feed(0, "hello")
        pool.flush(0)
        pool.feed(1, "aeio")
        pool.flush(1)
        return reader(pool)

    ahead = run(lambda p: np.concatenate(
        [p.read_blocks(2), p.read_blocks(2)], axis=1))
    single = run(lambda p: np.concatenate(
        [p.read_block() for _ in range(4)], axis=1))
    assert ahead.shape == single.shape == (2, 4096)
    np.testing.assert_allclose(ahead, single, atol=5e-4)
    from grail_tpu.utils import sample_error_db
    assert sample_error_db(ahead.ravel(), single.ravel()) < -60


def test_idle_then_feed_starts_promptly():
    """Regression: bulk idle-silence horizon appends must NOT delay text
    fed afterwards — the un-started pre-scheduled silence is trimmed on
    feed (keeping one element for blend continuity), so the new utterance
    begins within ~1 s of the current read position, not after seconds of
    pre-scheduled dead air."""
    s = StreamSession(voice="plain", language="english", block=1024)
    s.feed("hi ")
    s.flush()
    # drain into the idle regime and stop at a HIGH-coverage moment (right
    # after a bulk silence append), the worst case for feed latency
    for _ in range(400):
        s.read()
        if (s._horizon_tail >= 4 and
                int(s._end_samples()[-1]) - s._consumed_samples
                > 1.5 * s.sample_rate):
            break
    else:
        raise AssertionError("never reached the bulk-silence idle regime")
    s.feed("go ")
    s.flush()
    audio = np.concatenate([s.read() for _ in range(50)])
    nz = np.nonzero(np.abs(audio) > 1e-4)[0]
    assert len(nz) > 0, "second utterance never rendered"
    start_s = nz[0] / s.sample_rate
    assert start_s < 1.0, f"speech started {start_s:.2f}s late"


def test_pool_session_checkpoint_restore_roundtrip():
    """A pool-owned session's load_state must scatter the restored DSP
    state back into the pool's stacked device pytree: the next pool tick
    re-renders the post-checkpoint audio (compared against an independent
    solo session restored from the same blob). Solo read() on a pool-owned
    session is a RuntimeError (it would desynchronize the batch state)."""
    from grail_tpu.runtime.stream import StreamPool
    from grail_tpu.utils import sample_error_db

    pool = StreamPool(2, voice="plain", language="english", block=1024,
                      backend="fused_interpret")
    pool.feed(0, "hello world ")
    pool.flush(0)
    pool.feed(1, "aeio ")
    pool.flush(1)
    _ = pool.read_block()
    with pytest.raises(RuntimeError):
        pool.sessions[0].read()
    blob = pool.sessions[0].save_state()
    _ = pool.read_block()              # advance past the checkpoint
    pool.sessions[0].load_state(blob)  # rewind session 0
    after = pool.read_block()[0]

    solo = StreamSession(voice="plain", language="english", block=1024)
    solo.load_state(blob)
    ref = solo.read()
    assert sample_error_db(after, ref) < -60


def test_wav_encoders_agree_on_nonfinite():
    """Python and native WAV encoders must produce identical bytes for
    NaN/inf samples, matching Rust `as i16` semantics (NaN -> 0,
    saturating) — numpy's float->int cast is otherwise undefined."""
    from grail_tpu.runtime.native import native_encode_wav
    from grail_tpu.runtime.wav import encode_wav

    x = np.array([0.5, np.nan, -0.25, np.inf, -np.inf, 2.0], np.float32)
    py = np.frombuffer(encode_wav(x, 44100)[44:], np.int16)
    assert py.tolist() == [16383, 0, -8191, 32767, -32768, 32767]
    nat = native_encode_wav(x, 44100)
    if nat is not None:   # native lib may be absent (pure-python install)
        assert np.frombuffer(bytes(nat)[44:], np.int16).tolist() == py.tolist()


def test_cli_rejects_bad_resample_values():
    from grail_tpu.cli import main

    assert main(["-s", "-r", "abc", "ae"]) == 1     # non-numeric
    assert main(["-s", "-r", "0", "ae"]) == 1       # zero
    assert main(["-s", "-r", "-8000", "ae"]) == 1   # negative
    assert main(["-s", "-r", "2000", "ae"]) == 1    # below jitter bound


def test_host_boundaries_match_device_score():
    """ADVICE r2 (medium): host bookkeeping (_end_samples) and the device
    score must share ONE boundary convention — the reference's drifting f32
    countdown. The device score's retargeted lengths floor-cumsum to
    exactly the host's cached end samples."""
    s = StreamSession(voice="plain", language="english", block=1024)
    s.feed("hello there this is a boundary check ")
    s.flush()
    n_host = s._end_samples()
    score = s._build_score(len(s._elements))
    lens = np.asarray(score.length, np.float32)
    n_dev = np.floor(np.cumsum(lens, dtype=np.float32)
                     * np.float32(s.sample_rate)).astype(np.int64)
    np.testing.assert_array_equal(n_host, n_dev)


def test_rebase_carries_drift_residual():
    """Rebasing the rolling score must not shift the remaining elements'
    boundaries: the f32 countdown residual at the drop point is carried, so
    post-rebase boundaries equal the continuous stream's (shifted by the
    dropped prefix)."""
    from grail_tpu.text.intonate import PhonemeElem
    from grail_tpu.text.phonemes import Phoneme

    s = StreamSession(voice="plain", language="english", block=1024)
    elems = [PhonemeElem(Phoneme.A if i % 2 else Phoneme.E, 0.5, 0.5, 120 / 44100.0)
             for i in range(24)]
    s._elements = list(elems)
    s._rev += 1
    n0 = s._end_samples().copy()
    s._consumed_samples = int(n0[9]) + 5   # mid element 10
    s._rebase(min_drop=0)
    drop = 24 - len(s._elements)
    assert drop >= 1
    n1 = s._end_samples()
    np.testing.assert_array_equal(n1 + int(n0[drop - 1]), n0[drop:])


def test_pool_tick_pipelined_matches_sync_ticks():
    """Depth-2 pipelined ticks deliver the same audio as synchronous ticks,
    shifted by exactly one tick (first call returns None; drain() flushes
    the final in-flight block)."""
    from grail_tpu.runtime.stream import StreamPool

    def mk():
        pool = StreamPool(2, voice="plain", language="english", block=1024,
                          backend="fused_interpret")
        pool.feed(0, "hello world ")
        pool.flush(0)
        pool.feed(1, "aeio ")
        pool.flush(1)
        return pool

    p1 = mk()
    sync = [p1.read_block() for _ in range(5)]

    p2 = mk()
    assert p2.tick_pipelined() is None
    piped = [p2.tick_pipelined() for _ in range(4)] + [p2.drain()]
    assert p2.drain() is None
    for a, b in zip(sync, piped):
        np.testing.assert_array_equal(a, b)


def test_pool_checkpoint_restore_bit_exact():
    """StreamPool.save/load round-trip: a restored pool continues with
    BIT-IDENTICAL audio for every session (the serving migration/restart
    story — VERDICT r2 #6)."""
    from grail_tpu.runtime.stream import StreamPool

    pool = StreamPool(4, voice="plain", language="english", block=1024,
                      backend="fused_interpret", seeds=[3, 1, 4, 1])
    texts = ["hello world ", "aeio ", "the quick brown fox ", ""]
    for i, t in enumerate(texts):
        if t:
            pool.feed(i, t)
            pool.flush(i)
    for _ in range(3):
        _ = pool.read_block()
    blob = pool.save()
    cont = [pool.read_block() for _ in range(3)]
    pool.feed(0, "more ")   # mutate the original past the checkpoint
    _ = pool.read_block()

    pool2 = StreamPool(4, voice="plain", language="english", block=1024,
                       backend="fused_interpret", seeds=[9, 9, 9, 9])
    pool2.load(blob)
    cont2 = [pool2.read_block() for _ in range(3)]
    for a, b in zip(cont, cont2):
        np.testing.assert_array_equal(a, b)

    # shape mismatches are loud
    bad = StreamPool(2, voice="plain", language="english", block=1024,
                     backend="fused_interpret")
    with pytest.raises(ValueError):
        bad.load(blob)


def test_jitter_window_rebase_long_session():
    """The sliding jitter-lattice window: a session whose lattice window
    slides several times (tiny horizon) must BIT-MATCH a never-sliding
    session — the carried jitter phase is absolute and untouched by
    slides, so the window is purely a memory/shape optimization — with the
    lattice bucket (and so the jit shapes and device memory) bounded:
    long-running serving never recompiles or grows (VERDICT r2 #1)."""
    def run(horizon):
        s = StreamSession(voice="plain", language="english", block=1024,
                          jitter_horizon_s=horizon)
        s.feed("hello world hello world ")
        s.flush()
        out = np.concatenate([s.read() for _ in range(260)])
        return out, s

    a, sa = run(1.5)      # forces repeated window slides
    b, sb = run(1000.0)   # never slides
    assert sa._lat_base > 0 and sb._lat_base == 0   # slides actually happened
    assert sa._jitter_pos == sb._jitter_pos         # the clock never rebases
    assert sa._jitter_reserve <= 64                 # bucket stayed put
    assert np.isfinite(a).all()
    np.testing.assert_array_equal(a, b)


def test_jitter_rebase_staggered_across_seeds():
    """Sessions with distinct seeds must NOT slide their jitter window on
    the same tick (the slide thundering-herd: N simultaneous lattice
    version bumps turn one incremental row upload into a full pool
    restack). The stagger is seed-derived so each session still behaves
    identically solo or pooled."""
    first_rebase = {}
    for seed in range(4):
        s = StreamSession(voice="generic", seed=seed, block=1024,
                          jitter_horizon_s=1.5)
        s.feed("aeae aeae ")
        s.flush()
        for t in range(120):
            s.read()
            if s._lat_base > 0:               # window slid this tick
                first_rebase[seed] = t
                break
        assert seed in first_rebase, "no rebase within 120 ticks"
    assert len(set(first_rebase.values())) >= 3, first_rebase


def test_windowed_tick_matches_full_lattice_at_large_offset():
    """The lat_window fast path must be bit-identical to the full-lattice
    gather at ANY absolute jitter offset. Regression: the kernel used to
    clamp the absolute lattice cell index against the TRUNCATED window's
    row count, so once floor(jitter_pos*inc) exceeded the window (~0.4 s
    of stream at a pool's multi-second jitter horizon) the relative row
    index went negative and all jitter silently zeroed out."""
    import jax
    import jax.numpy as jnp

    from grail_tpu.runtime.stream import _stream_tick_fused_body
    from grail_tpu.synth.kernel_fused import _n_lat_rows
    from grail_tpu.synth.synthesize import SynthState

    s = StreamSession(voice="generic", block=1024)
    s.feed("aeae aeae aeae")
    blk = 1024
    jpos = 20 * 44100          # 20 s absolute jitter offset, no rebase
    inc = float(s.voice.jitter_frequency)
    cells = int((jpos + blk + 1) * inc) + 8
    s._lattice.ensure(cells)
    lat = jax.tree.map(lambda x: jnp.asarray(x)[None], s._lattice.window())
    score = jax.tree.map(lambda x: jnp.asarray(x)[None], s._build_score(16))
    jp = (jnp.float32(inc),
          jnp.float32(s.voice.jitter_delta_frequency),
          jnp.float32(s.voice.jitter_delta_formant_frequency),
          jnp.float32(s.voice.jitter_delta_amplitude))
    st = SynthState(*(jnp.asarray(x)[None] for x in s._state))
    off = jnp.zeros(1, jnp.int32)
    from grail_tpu.synth.schedule import get_schedule

    phase, cell = get_schedule(inc).state_at(jpos)
    jstate = (jnp.full(1, phase, jnp.float32), jnp.full(1, cell, jnp.int32))
    lat_base = jnp.zeros(1, jnp.int32)
    win = _n_lat_rows(blk) + _n_lat_rows(128) + 2

    full, _, _, _ = _stream_tick_fused_body(
        score, lat, jp, jnp.float32(44100.0), off, jstate, lat_base, st,
        blk, interpret=True, lat_window=None)
    windowed, _, _, _ = _stream_tick_fused_body(
        score, lat, jp, jnp.float32(44100.0), off, jstate, lat_base, st,
        blk, interpret=True, lat_window=win)
    full = np.asarray(full)
    assert float(np.sqrt((full ** 2).mean())) > 1e-3   # real signal
    assert np.array_equal(full, np.asarray(windowed))


def test_serve_start_warms_live_jit_shapes():
    """serve_start's warm-up must populate the SAME jit call cache the
    live dispatch uses: a feed + tick after serve_start may not add any
    compiled shape. Regression: the warm-up used .lower().compile(),
    whose executable never enters jax.jit's cache — every first feed hit
    a mid-serving compile (the ~1.9 s RT-thread stall the warm-up exists
    to prevent)."""
    from grail_tpu.runtime.stream import (StreamPool, _scatter_rows,
                                          _stream_tick_fused)

    pool = StreamPool(4, voice="generic", block=1024,
                      backend="fused_interpret", pin_elems=24)
    pool.feed(0, "aeae")
    pool.flush(0)
    pool.serve_start()
    try:
        sc = _scatter_rows._cache_size()
        tc = _stream_tick_fused._cache_size()
        assert sc >= 3          # K in {1, 2, 4} (K=8 > n)
        pool.feed(1, "ea")
        pool.flush(1)
        pool._serve_build()     # frontend publish: K=1 scatter
        np.asarray(pool.serve_tick())
        assert _scatter_rows._cache_size() == sc
        assert _stream_tick_fused._cache_size() == tc
    finally:
        pool.serve_stop()


def test_pool_long_run_matches_solo_across_window_slides():
    """End-to-end guard over the whole serving stack at once: a pooled
    fused windowed tick streamed through several (staggered) jitter-window
    slides and incremental scatters must match solo sessions on the XLA
    path. 35 ticks at a 0.3 s jitter horizon force >= 1 slide per session;
    this is the run length at which the windowed-tick clamp bug zeroed all
    jitter while every short test stayed green."""
    from grail_tpu.runtime.stream import StreamPool

    ticks = 35
    pool = StreamPool(2, voice="generic", block=1024,
                      backend="fused_interpret", jitter_horizon_s=0.3)
    pool.feed(0, "aeae aeae ")
    pool.feed(1, "eaea ")
    pool.flush()
    pooled = np.concatenate([pool.read_block() for _ in range(ticks)], axis=1)
    slides = [s._lat_base for s in pool.sessions]
    assert all(d > 0 for d in slides), slides          # every session slid
    assert len(set(slides)) == 2, slides               # ...on different ticks

    for i, txt in enumerate(["aeae aeae ", "eaea "]):
        s = StreamSession(voice="generic", seed=i, block=1024,
                          jitter_horizon_s=0.3)
        s.feed(txt)
        s.flush()
        solo = s.read(ticks * 1024)
        assert sample_error_db(pooled[i], solo) < -60, i


def test_pool_pcm16_output_matches_f32():
    """output='pcm16' pools emit int16 PCM with the WAV encoder's Rust
    `as i16` semantics, matching the f32 pool's audio converted host-side
    (halves device->host serving bandwidth)."""
    from grail_tpu.runtime.stream import StreamPool

    def mk(output):
        pool = StreamPool(2, voice="plain", language="english", block=1024,
                          backend="fused_interpret", output=output)
        pool.feed(0, "hello ")
        pool.flush(0)
        return np.concatenate([pool.read_block() for _ in range(6)], axis=1)

    a16 = mk("pcm16")
    a32 = mk("f32")
    assert a16.dtype == np.int16
    expect = np.clip(a32 * 32767.0, -32768, 32767)
    expect = np.where(np.isnan(expect), 0, expect).astype(np.int16)
    np.testing.assert_array_equal(a16, expect)
    with pytest.raises(ValueError):
        StreamPool(1, output="wat")


def test_pool_serve_mode_matches_read_block():
    """serve mode (async frontend + dispatch-only RT ticks) is bit-exact
    vs the read_block path: maintenance moving to the frontend thread must
    not change a single sample. Feeds land via a frontend publish and do
    not disturb other sessions."""
    from grail_tpu.runtime.stream import StreamPool

    n = 4

    def mk():
        pool = StreamPool(n, voice="plain", language="english", block=1024,
                          backend="fused_interpret", pin_elems=64)
        for i in range(n):
            pool.feed(i, ["hello", "hi there", "go on", "stop it"][i])
            pool.flush(i)
        return pool

    ref_pool = mk()
    ref = [np.asarray(ref_pool.read_block()) for _ in range(12)]

    pool = mk()
    # period=9999: the frontend thread idles; builds are driven explicitly
    # so the publish points are deterministic for the test
    pool.serve_start(period=9999)
    got = []
    for k in range(12):
        if k == 5:
            pool.feed(1, " more")
            pool.flush(1)
            pool._serve_build()
        got.append(np.asarray(pool.serve_tick()))
    pool.serve_stop()

    for k in range(5):        # before the extra feed: identical pools
        np.testing.assert_array_equal(got[k], ref[k])
    for k in range(12):       # the feed only ever touches session 1
        np.testing.assert_array_equal(got[k][[0, 2, 3]], ref[k][[0, 2, 3]])


def test_pool_serve_mode_xla_backend():
    """serve_start works on the non-fused (xla) backend too — the AOT
    warm-up path must not assume fused-only locals (regression: serve_start
    crashed with UnboundLocalError on backend='xla' because the scatter
    warm-up used a variable only set in the fused branch)."""
    from grail_tpu.runtime.stream import StreamPool

    def mk(serve):
        pool = StreamPool(2, voice="plain", language="english", block=1024,
                          backend="xla")
        pool.feed(0, "hi")
        pool.flush(0)
        if serve:
            pool.serve_start(period=9999)
            out = [np.asarray(pool.serve_tick()) for _ in range(4)]
            pool.serve_stop()
        else:
            out = [np.asarray(pool.read_block()) for _ in range(4)]
        return out

    got, ref = mk(True), mk(False)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(g, r)


def test_pool_serve_pin_elems_fixes_bucket():
    """pin_elems pins the tick's element bucket (jit-shape stability for
    strict-deadline serving): short scores pad up to the pin instead of
    switching buckets as text drains."""
    from grail_tpu.runtime.stream import StreamPool, _bucket

    pool = StreamPool(2, voice="plain", language="english", block=1024,
                      backend="fused_interpret", pin_elems=48)
    pool.feed(0, "hi")
    pool.flush(0)
    dev = pool._prepare_tick()
    E = int(np.asarray(dev["scores"].length).shape[1])
    assert E == _bucket(48) == 64


def test_ulaw_output_round_trip():
    """output='ulaw' emits G.711 mu-law (uint8) whose decode matches the
    pcm16 stream within one mu-law quantization step (the telephony
    serving format: quarters device->host audio bandwidth vs f32)."""
    from grail_tpu.runtime.stream import StreamPool, ulaw_decode

    def mk(output):
        pool = StreamPool(2, voice="plain", language="english", block=1024,
                          backend="fused_interpret", output=output)
        pool.feed(0, "hello ")
        pool.flush(0)
        return np.concatenate([pool.read_block() for _ in range(6)], axis=1)

    u = mk("ulaw")
    p = mk("pcm16")
    assert u.dtype == np.uint8
    dec = ulaw_decode(u).astype(np.int32)
    err = np.abs(dec - p.astype(np.int32))
    # mu-law step size at |x| is ~ (|x|+132)/16 (one mantissa LSB of the
    # active segment) — allow one step plus rounding
    step = (np.abs(p.astype(np.int32)) + 132) // 16 + 4
    assert np.all(err <= step), (err.max(), step[err > step][:4])


def test_ulaw_encode_reference_points():
    """Pin the encoder against hand-computed G.711 values."""
    import jax.numpy as jnp

    from grail_tpu.runtime.stream import _ulaw_body, ulaw_decode

    x = np.array([0.0, 1.0, -1.0, 0.25, -0.25, 1e-4], np.float32)
    code = np.asarray(_ulaw_body(jnp.asarray(x)))
    assert code.dtype == np.uint8
    assert code[0] == 0xFF          # +0 encodes to 0xFF
    assert code[1] == 0x80          # +max -> 0x80
    assert code[2] == 0x00          # -max -> 0x00
    dec = ulaw_decode(code)
    assert abs(int(dec[1]) - 32124) <= 0   # G.711 max decode magnitude
    assert int(dec[2]) == -32124


def test_stream_command_split_across_feed_chunks():
    """A [command] split across feed() chunk boundaries (network streaming)
    buffers until terminated — the same incremental contract transcription
    has — instead of raising mid-stream."""
    s = StreamSession(voice="plain", language="english")
    base = s.voice.center_frequency * s.sample_rate
    s.feed("hello [pit", parse_commands=True)
    assert s._pending_cmd == "[pit"
    s.feed("ch:150] there", parse_commands=True)
    assert s._pending_cmd == ""
    assert abs(s.voice.center_frequency * s.sample_rate - 150.0) < 1e-3
    assert abs(base - 150.0) > 1.0      # it actually changed
    s.flush()
    a = s.read(44100)
    assert np.isfinite(a).all() and np.max(np.abs(a)) > 0.01

    # trailing single '[' / ']' are held (possible '[[' / ']]' halves)
    s2 = StreamSession(voice="plain", language="english")
    s2.feed("a[", parse_commands=True)
    s2.feed("[b", parse_commands=True)      # completes the literal '['
    assert s2._pending_cmd == ""
    s2.feed("c]", parse_commands=True)
    assert s2._pending_cmd == "]"
    s2.feed("]d", parse_commands=True)      # completes the literal ']'
    assert s2._pending_cmd == ""


def test_stream_command_unterminated_at_flush_raises():
    """flush() is end-of-input: an unterminated command fragment raises
    loudly, and the fragment stays buffered so the caller may still
    terminate it with more text."""
    s = StreamSession(voice="plain", language="english")
    s.feed("x[rate:2", parse_commands=True)
    with pytest.raises(ValueError):
        s.flush()
    assert s._pending_cmd == "[rate:2"      # preserved across the error
    s.feed(".5]", parse_commands=True)
    s.flush()
    assert abs(s.speaking_rate - 2.5) < 1e-6


def test_pool_save_while_serving_raises():
    from grail_tpu.runtime.stream import StreamPool

    pool = StreamPool(2, voice="plain", language="english", block=1024,
                      backend="xla")
    pool.feed(0, "hi")
    pool.flush(0)
    pool.serve_start(period=9999)
    try:
        with pytest.raises(RuntimeError):
            pool.save()
    finally:
        pool.serve_stop()
    payload = pool.save()               # fine once stopped
    assert isinstance(payload, bytes) and len(payload) > 0


def test_lehmer_skip_negative_distance_raises():
    from grail_tpu.core.rng import lehmer_skip

    with pytest.raises(ValueError):
        lehmer_skip(-1)
    assert lehmer_skip(0) == (1, 0)     # identity


def test_serve_start_warms_k8_scatter_bucket():
    """For 4 < n, a frontend cycle may scatter up to min(8, n) changed
    sessions, bucketed to K=8 (pad rows). serve_start must warm that
    shape too — regression: the warm loop broke at K > n, so n in
    {5, 6, 7} hit an unwarmed K=8 jit shape mid-serving."""
    from grail_tpu.runtime.stream import StreamPool, _scatter_rows

    pool = StreamPool(6, voice="generic", block=1024,
                      backend="fused_interpret", pin_elems=24)
    pool.feed(0, "aeae")
    pool.flush(0)
    pool.serve_start(period=9999)
    try:
        sc = _scatter_rows._cache_size()
        for i in range(1, 6):           # 5 changed sessions -> K=8 bucket
            pool.feed(i, "ea")
            pool.flush(i)
        pool._serve_build()
        np.asarray(pool.serve_tick())
        assert _scatter_rows._cache_size() == sc
    finally:
        pool.serve_stop()


def test_stream_command_parser_partial_split_fuzz():
    """Invariant: feeding a string through the incremental (partial=True)
    path split at EVERY cut point yields exactly the chunks of a whole
    parse, and raises iff the whole parse raises — the session's
    chunk-buffering can never reorder, drop, or duplicate input."""
    import random

    from grail_tpu.runtime.stream import _parse_commands

    def merged(chunks):
        out = []
        for kind, val in chunks:
            if kind == "text" and out and out[-1][0] == "text":
                out[-1] = ("text", out[-1][1] + val)
            else:
                out.append((kind, val))
        return out

    def incremental(parts):
        buf, out = "", []
        for p in parts:
            chunks, buf = _parse_commands(buf + p, partial=True)
            out += chunks
        out += _parse_commands(buf)         # end of input: strict
        return merged(out)

    rng = random.Random(1)
    alphabet = "a[]:ex "
    for _ in range(300):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 24)))
        try:
            whole = merged(_parse_commands(s))
        except ValueError:
            whole = None
        for cut in range(len(s) + 1):
            try:
                got = incremental([s[:cut], s[cut:]])
            except ValueError:
                got = None
            assert got == whole, (s, cut, got, whole)


def test_serve_mode_mid_serving_backend_downgrade(monkeypatch):
    """A publish that downgrades the backend (fused_supported's
    pathological-score fallback) compiles the xla tick + output jit on the
    FRONTEND thread before the swap becomes adoptable; serve_tick then
    dispatches it without a mid-RT compile and output conversion still
    applies."""
    import grail_tpu.synth.kernel_fused as kf
    from grail_tpu.runtime.stream import StreamPool

    pool = StreamPool(2, voice="plain", language="english", block=1024,
                      backend="fused_interpret", output="pcm16",
                      pin_elems=64)
    pool.feed(0, "hello")
    pool.flush(0)
    pool.serve_start(period=9999)
    try:
        a = np.asarray(pool.serve_tick())
        assert a.dtype == np.int16
        assert pool._serve_dev["backend"] == "fused_interpret"
        monkeypatch.setattr(kf, "fused_supported", lambda *a, **k: False)
        pool.feed(1, "go on")
        pool.flush(1)
        assert pool._serve_build()          # publish with the downgrade
        assert any(k[0] == "xla" for k in pool._serve_warmed)  # frontend-warmed
        b = np.asarray(pool.serve_tick())
        assert pool._serve_dev["backend"] == "xla"
        assert b.dtype == np.int16 and np.isfinite(b.astype(np.float64)).all()
        assert np.abs(b).max() > 0          # real audio through the fallback
    finally:
        pool.serve_stop()


@pytest.mark.skipif(not native.available(), reason="native library not built")
def test_native_drift_boundaries_matches_numpy():
    """gn_drift_boundaries is bit-identical to the NumPy f32 drift twin —
    counts AND residual bits — across random lengths/rates/entry residuals
    (the boundary-retarget machinery depends on exact agreement: one
    sample off permanently displaces the carrier phase, docs/PARITY.md)."""
    from grail_tpu.synth.score import _reference_boundary_samples_np

    rng = np.random.default_rng(7)
    for trial in range(100):
        E = int(rng.integers(1, 16))
        lengths = (rng.choice(
            [0.5, 0.25, 0.0571, 0.012, 0.0001, 0.9999, 1.7, 0.03], size=E)
            * rng.uniform(0.5, 1.5)).astype(np.float32)
        sr = float(rng.choice([44100.0, 22050.0, 48000.0]))
        t0 = np.float32(rng.uniform(-0.00002, 0.0005))
        a_c, a_r = native.native_drift_boundaries(lengths, sr, float(t0))
        b_c, b_r = _reference_boundary_samples_np(lengths, sr, t0=t0)
        assert np.array_equal(a_c, b_c), trial
        assert np.array_equal(a_r.view(np.uint32),
                              np.asarray(b_r).view(np.uint32)), trial
    # zero-length input
    c, r = native.native_drift_boundaries(np.empty(0, np.float32), 44100.0)
    assert len(c) == 0 and len(r) == 0


def test_incremental_boundaries_match_full_recompute():
    """_boundaries' longest-common-prefix reuse (feed/append/trim resume
    the drift sim from the cached residual) is bit-identical to a fresh
    full simulation after any mutation sequence."""
    from grail_tpu.synth.score import _reference_boundary_samples

    rng = np.random.default_rng(3)
    s = StreamSession(voice="plain", language="english")
    texts = ["hello ", "world of ", "synthesis ", "go on and on ", "stop "]
    for step in range(40):
        op = int(rng.integers(0, 3))
        if op == 0:
            s.feed(texts[int(rng.integers(0, len(texts)))])
        elif op == 1:
            s.read(int(rng.integers(1000, 60000)))  # horizon/rebase/trim
        else:
            s.flush()
        endn, resid = s._boundaries()
        if s._elements:
            e2, r2 = _reference_boundary_samples(
                [e.length for e in s._elements], s.sample_rate,
                t0=float(s._drift_t0))
            assert np.array_equal(endn, e2), step
            assert np.array_equal(np.asarray(resid).view(np.uint32),
                                  np.asarray(r2).view(np.uint32)), step


def test_feed_malformed_command_is_atomic():
    """A malformed command raises WITHOUT consuming anything: the fragment
    plus the chunk's text stay buffered, so no input is silently lost and
    a later corrective feed can recover."""
    s = StreamSession(voice="plain", language="english")
    s.feed("[pit", parse_commands=True)
    with pytest.raises(ValueError):
        s.feed("ch 00] hello there", parse_commands=True)
    assert s._pending_cmd == "[pitch 00] hello there"   # nothing lost
    s._pending_cmd = ""                                 # caller recovery
    s.feed("[pitch:150] hello there", parse_commands=True)
    s.flush()
    assert np.max(np.abs(s.read(44100))) > 0.01


def test_pool_load_while_serving_raises():
    from grail_tpu.runtime.stream import StreamPool

    pool = StreamPool(2, voice="plain", language="english", block=1024,
                      backend="xla")
    pool.feed(0, "hi")
    pool.flush(0)
    payload = pool.save()
    pool.serve_start(period=9999)
    try:
        with pytest.raises(RuntimeError):
            pool.load(payload)
    finally:
        pool.serve_stop()
    pool.load(payload)                     # fine once stopped


def test_ulaw_exponent_integer_ladder_at_segment_edges():
    """The integer comparison-ladder exponent equals floor(log2(m))-7 for
    EVERY reachable magnitude — exactly at and around each segment edge
    (where an approximate hardware log2 could floor one off)."""
    import jax.numpy as jnp

    from grail_tpu.runtime.stream import _ulaw_body, ulaw_decode

    # all segment-boundary pcm magnitudes +-2 (m = |pcm|+0x84 crosses 2^k)
    edges = []
    for k in range(8, 15):
        c = (1 << k) - 0x84
        edges += [c - 2, c - 1, c, c + 1, c + 2]
    pcm = np.array([min(max(v, 0), 32767) for v in edges], np.int32)
    x = (pcm.astype(np.float32) / 32767.0)
    code = np.asarray(_ulaw_body(jnp.asarray(x)))
    m = np.minimum(np.abs(pcm), 32635) + 0x84
    e_ref = np.clip(np.floor(np.log2(m.astype(np.float64))).astype(np.int32)
                    - 7, 0, 7)
    e_got = ((~code.astype(np.int32)) >> 4) & 0x7
    np.testing.assert_array_equal(e_got, e_ref)
    # decode round-trip stays within one mu-law step
    dec = ulaw_decode(code).astype(np.int64)
    step = (np.abs(pcm) + 132) // 16 + 4
    assert np.all(np.abs(dec - pcm) <= step)


def test_serve_warm_covers_shape_changes():
    """A mid-serving jit SHAPE change (E-bucket growth) re-warms on the
    frontend thread: after the publish, the RT tick dispatches the new
    shape without adding a compiled-shape cache entry."""
    from grail_tpu.runtime.stream import StreamPool, _stream_tick_fused

    pool = StreamPool(2, voice="plain", language="english", block=1024,
                      backend="fused_interpret", pin_elems=16)
    pool.feed(0, "hi")
    pool.flush(0)
    pool.serve_start(period=9999)
    try:
        np.asarray(pool.serve_tick())
        E0 = pool._cache_key[0]
        pool.feed(0, "a much longer feed that grows the element bucket "
                     "past its pin for sure, yes indeed it does grow")
        pool.flush(0)
        assert pool._serve_build()
        assert pool._cache_key[0] > E0      # the bucket actually grew
        tc = _stream_tick_fused._cache_size()
        np.asarray(pool.serve_tick())       # dispatches the NEW shape
        assert _stream_tick_fused._cache_size() == tc   # no RT compile
    finally:
        pool.serve_stop()


def test_serve_mode_threaded_soak():
    """Concurrency smoke over the real locking paths: the frontend thread
    rebuilds on its own period while a feeder thread issues live feeds and
    the main thread runs RT ticks. No exceptions, finite audio, and the
    fed sessions actually produce sound."""
    import threading

    from grail_tpu.runtime.stream import StreamPool

    pool = StreamPool(4, voice="plain", language="english", block=1024,
                      backend="fused_interpret", pin_elems=64)
    pool.feed(0, "hello")
    pool.flush(0)
    pool.serve_start(period=0.005)      # frontend spins for real
    errors = []

    def feeder():
        import random
        rng = random.Random(0)
        try:
            for _ in range(40):
                i = rng.randrange(4)
                pool.feed(i, rng.choice(["go ", "on ", "hi ", "la "]))
                pool.flush(i)
        except Exception as e:          # pragma: no cover - the assertion
            errors.append(e)

    th = threading.Thread(target=feeder)
    th.start()
    blocks = []
    try:
        for _ in range(60):
            blocks.append(np.asarray(pool.serve_tick()))
    finally:
        th.join(timeout=30)
        pool.serve_stop()
    assert not errors, errors
    audio = np.concatenate(blocks, axis=1)
    assert np.isfinite(audio).all()
    assert np.abs(audio).max() > 0.01       # someone spoke
    # post-stop counters resynced: a normal read works and stays finite
    tail = pool.read_block()
    assert np.isfinite(tail).all()
