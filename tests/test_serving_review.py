"""Regression tests for the round-3 whole-file review of runtime/stream.py.

Each test pins one finding: command apply-atomicity, jitter-rate-checked
voice switches, checkpoint completeness (live-command state, horizon
tail), serve-mode guards on per-session checkpoints, read(0), and the
incremental scatter path surviving live [pitch:]/[voice:] commands.
"""

import numpy as np
import pytest

from grail_tpu.runtime.stream import StreamPool, StreamSession


def test_command_apply_failure_is_atomic():
    # a command that PARSES but cannot APPLY ([rate:fast]) must consume
    # nothing: text after it stays buffered, not silently dropped
    s = StreamSession(voice="plain", language="english")
    with pytest.raises(ValueError):
        s.feed("hi [rate:fast] world", parse_commands=True)
    assert s._pending_cmd == "hi [rate:fast] world"
    assert s._elements == [] and s._pending_chars == []
    # recovery: clear the bad buffer and refeed corrected input
    s._pending_cmd = ""
    s.feed("hi [rate:1.5] world", parse_commands=True)
    s.flush()
    assert s.speaking_rate == 1.5
    assert len(s._elements) > 0


def test_unknown_voice_lang_commands_raise_valueerror():
    # registry KeyErrors surface as the documented ValueError
    s = StreamSession(voice="plain", language="english")
    for cmd in ("[voice:doesnotexist]", "[lang:doesnotexist]"):
        with pytest.raises(ValueError):
            s.feed(cmd, parse_commands=True)
        s._pending_cmd = ""


def test_voice_switch_requires_equal_jitter_rate():
    from grail_tpu.voices import get_spec, register_voice
    import dataclasses

    spec = dataclasses.replace(get_spec("plain"), name="slowjitter",
                               jitter_frequency_hz=8.0)
    register_voice(spec)
    s = StreamSession(voice="plain", language="english")
    with pytest.raises(ValueError, match="jitter rate"):
        s.feed("[voice:slowjitter]", parse_commands=True)


def test_read_zero_samples_is_a_noop():
    s = StreamSession(voice="plain", language="english")
    s.feed("la")
    s.flush()
    consumed = s._consumed_samples
    out = s.read(0)
    assert out.shape == (0,)
    assert s._consumed_samples == consumed and len(s._residual) == 0


def test_checkpoint_restores_live_command_state():
    # a session steered by live commands must resume with those settings,
    # not the restoring session's constructor defaults
    a = StreamSession(voice="generic", language="generic", seed=3)
    a.feed("[voice:plain][pitch:150][rate:1.5][lang:english]hello ",
           parse_commands=True)
    a.flush()
    _ = a.read(4096)
    payload = a.save_state()
    cont_a = a.read(8192)

    b = StreamSession(voice="generic", language="generic", seed=99)
    b.load_state(payload)
    assert b.voice.name == "plain"
    assert float(b.voice.center_frequency) == pytest.approx(
        150.0 / b.sample_rate)
    assert b.speaking_rate == 1.5
    assert b.language.name == "english"
    np.testing.assert_array_equal(cont_a, b.read(8192))
    # text fed after restore transcribes under the restored language
    b.feed("shy")                  # 'sh' is an english digraph
    b.flush()


def test_checkpoint_restores_horizon_tail():
    # idle-horizon silence captured in a checkpoint must stay trimmable:
    # text fed right after a restore may not play seconds late
    a = StreamSession(voice="plain", language="english", seed=0)
    _ = a.read(2048)               # idle read pre-schedules silence
    assert a._horizon_tail > 0
    payload = a.save_state()

    b = StreamSession(voice="plain", language="english", seed=0)
    b.load_state(payload)
    assert b._horizon_tail == a._horizon_tail
    b.feed("la")
    b.flush()
    # the pre-scheduled tail was trimmed: the new text starts within a
    # couple of elements (~1 s), not after the multi-second idle horizon
    assert b.pending_seconds < 2.5


def test_session_checkpoint_guarded_while_pool_serving():
    pool = StreamPool(2, voice="plain", language="english",
                      backend="fused_interpret", block=128)
    pool.serve_start(period=0.05)
    try:
        with pytest.raises(RuntimeError, match="serve"):
            pool.sessions[0].save_state()
        with pytest.raises(RuntimeError, match="serve"):
            pool.sessions[0].load_state(b"ignored")
    finally:
        pool.serve_stop()
    # after serve_stop the same calls work
    payload = pool.sessions[0].save_state()
    pool.sessions[0].load_state(payload)


def test_pitch_command_stays_on_scatter_path():
    # a live [pitch:]/[voice:] command replaces one session's Voice object;
    # the pool upload cache must treat that as a K-row scatter (score rows
    # + jitter deltas), NOT a full [N, E] stack re-upload
    import grail_tpu.synth.score as score_mod

    pool = StreamPool(4, voice="plain", language="english",
                      backend="fused_interpret", block=128)
    for i in range(4):
        pool.feed(i, "lala")
    pool.flush()
    _ = pool.read_block()          # populate the device cache

    calls = []
    orig = score_mod.stack_scores

    def counting(rows):
        calls.append(len(rows))
        return orig(rows)

    score_mod.stack_scores = counting
    try:
        pool.feed(1, "[pitch:180][voice:bright]la", parse_commands=True)
        pool.flush(1)
        dev = pool._prepare_tick()
    finally:
        score_mod.stack_scores = orig
    # one changed session -> K=1 row stack, never the full N=4 rebuild
    assert calls and max(calls) == 1
    # the scattered jparams carry the NEW voice's deltas for session 1 only
    bright = pool.sessions[1].voice
    assert float(dev["jparams"][1][1]) == pytest.approx(
        float(bright.jitter_delta_frequency))
    assert float(dev["jparams"][3][0]) == pytest.approx(
        float(pool.sessions[0].voice.jitter_delta_amplitude))
    out = pool.read_block()
    assert np.isfinite(out).all()


def test_pool_live_voice_switch_matches_solo():
    # end-to-end correctness of the scatter path under a live voice switch:
    # the pooled session's audio must equal the same session run solo
    solo = StreamSession(voice="plain", language="english", seed=1,
                         block=128)
    pool = StreamPool(2, voice="plain", language="english", seeds=[0, 1],
                      backend="fused_interpret", block=128)
    script = [(0, "la"), (2, "[voice:bright]la"), (5, "[pitch:90]la")]
    got, want = [], []
    k = 0
    for t in range(8):
        while k < len(script) and script[k][0] == t:
            solo.feed(script[k][1], parse_commands=True)
            solo.flush()
            pool.feed(1, script[k][1], parse_commands=True)
            pool.flush(1)
            k += 1
        want.append(solo.read(128))
        got.append(pool.read_block()[1])
    err = np.max(np.abs(np.concatenate(got) - np.concatenate(want)))
    assert err < 1e-5              # interpret-mode kernel vs XLA solo path


def test_pool_quiet_fast_path_bit_exact_and_engaged():
    """The steady-state quiet-horizon fast path (_prepare_tick) must (a)
    actually engage, (b) stay bit-identical to a pool with the fast path
    disabled across many ticks INCLUDING staggered lattice-window slides,
    and (c) invalidate correctly when a feed lands mid-quiet."""
    text = "hello there my friend, the synthesizers hum along. " * 3

    def mk():
        p = StreamPool(2, voice="plain", language="english", block=1024,
                       backend="fused_interpret", jitter_horizon_s=2.0)
        for i in range(2):
            p.feed(i, text)
            p.flush(i)
        return p

    fast, ctrl = mk(), mk()
    maintained = [0]
    for s in fast.sessions:
        orig = s._ensure_audio_horizon

        def counted(blk, _o=orig):
            maintained[0] += 1
            return _o(blk)

        s._ensure_audio_horizon = counted

    n_ticks = 120            # ~2.8 s/session: several window slides at 2 s
    fed = False
    skipped = 0
    lat_v0 = tuple(s._lattice.version for s in fast.sessions)
    for t in range(n_ticks):
        if t == 40 and not fed:       # a feed mid-quiet must invalidate
            for p in (fast, ctrl):
                p.feed(0, "more text arrives now. ")
                p.flush(0)
            fed = True
        before = maintained[0]
        ctrl._quiet = None            # control: full maintenance every tick
        a = fast.read_block()
        b = ctrl.read_block()
        if maintained[0] == before:
            skipped += 1
        np.testing.assert_array_equal(a, b, err_msg=f"tick {t}")
    assert skipped > n_ticks // 2, skipped          # fast path engaged
    assert tuple(s._lattice.version for s in fast.sessions) != lat_v0, \
        "no lattice-window slide happened; the test lost its teeth"
