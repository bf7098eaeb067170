"""Exact-carrier-phase regression tests (the round-4 long-form fix).

The reference accumulates carrier phase per sample in f32 (`phase += f;
if phase >= 1 { phase -= 1 }`, /root/reference/src/lib.rs:520-525). The
production Q32 fixed-point prefix sum is rounding-free and therefore
drifts from the reference by ~0.1 cycles over 86 s (-60.7 dB alone,
docs/PARITY.md). These tests pin the native carrier pre-pass
(gn_carrier_phase_track) bit-exactly against the oracle's own phase
recurrence and pin the device plumbing that consumes the track.
"""

import numpy as np
import pytest

from grail_tpu.api import (WARMUP, _carrier_track_for, _split_carrier,
                           text_to_phoneme_elems, synthesize,
                           synthesize_batch)
from grail_tpu.oracle import gold_dsp_chain
from grail_tpu.oracle.native import (native_carrier_phase_track,
                                     native_oracle_available)
from grail_tpu.oracle import reference as orc
from grail_tpu.text.intonate import PhonemeElem
from grail_tpu.text.phonemes import Phoneme
from grail_tpu.utils import spectral_error_db
from grail_tpu.voices import get_voice
from grail_tpu.voices.preset_generic import SPEC

F32 = np.float32
needs_native = pytest.mark.skipif(not native_oracle_available(),
                                  reason="native oracle twin not built")


def _pelems():
    # short but structurally varied: leading silence, two vowels with
    # distinct frequencies, interior silence, tail vowel (~0.7 s total)
    return [
        PhonemeElem(Phoneme.SILENCE, 0.1, 0.02, 1.0),
        PhonemeElem(Phoneme.A, 0.2, 0.05, 1.1),
        PhonemeElem(Phoneme.E, 0.15, 0.08, 0.9),
        PhonemeElem(Phoneme.SILENCE, 0.08, 0.02, 1.0),
        PhonemeElem(Phoneme.A, 0.18, 0.04, 1.0),
    ]


@needs_native
def test_native_track_matches_oracle_recurrence():
    """The native pre-pass emits the exact pre-update phase the oracle's
    own synthesis loop consumes (reference recurrence, f32 per sample)."""
    pelems = _pelems()
    track = native_carrier_phase_track(pelems, SPEC, jitter_seed=0)
    assert track is not None

    voice = orc.NpVoice.from_spec(SPEC)
    from grail_tpu.synth.score import merge_glides
    seq = orc.oracle_select(merge_glides(list(pelems)), voice)
    stream = orc.oracle_jitter(
        orc.oracle_sequence(seq, float(voice.sample_rate)), 0, voice)

    one = F32(1.0)
    phase = F32(0.0)
    for k, elem in enumerate(stream):
        # emitted value is the PRE-update phase (what polyBLEP/saw read)
        assert phase.view(np.uint32) == track[k].view(np.uint32), k
        phase = F32(phase + elem.frequency)
        if phase >= 1.0:
            phase = F32(phase - one)
    assert k + 1 == len(track)


@needs_native
def test_exact_carrier_closes_solo_residual():
    """End-to-end: the xla path with the exact carrier lands on the scan
    path's fidelity floor; disabling it measurably drifts (proves the
    track is consumed, not silently dropped)."""
    v = get_voice("generic")
    pelems = text_to_phoneme_elems("aeae", v, "generic")
    gold = gold_dsp_chain(pelems, SPEC)

    exact = synthesize("aeae", voice="generic", language="generic",
                       backend="xla", exact_carrier=True)
    q32 = synthesize("aeae", voice="generic", language="generic",
                     backend="xla", exact_carrier=False)
    n = min(len(gold), len(exact))
    db_exact = spectral_error_db(exact[:n], gold[:n])
    db_q32 = spectral_error_db(q32[:n], gold[:n])
    assert db_exact < -70.0, db_exact
    # Q32 stays sub-gate but measurably behind the exact track
    assert db_exact < db_q32 - 3.0, (db_exact, db_q32)


@needs_native
def test_fused_split_carrier_matches_xla():
    """The overlap-save split-fused kernel consuming per-segment carrier
    windows agrees with the monolithic xla core consuming the flat track."""
    kw = dict(voice="generic", language="generic")
    a = synthesize_batch(["aeae"], backend="fused_interpret",
                         exact_carrier=True, **kw)[0]
    b = synthesize("aeae", backend="xla", exact_carrier=True, **kw)
    n = min(len(a), len(b))
    np.testing.assert_allclose(a[:n], b[:n], atol=2e-5, rtol=0)


@needs_native
def test_inkernel_carrier_matches_host_track():
    """exact_carrier='kernel' (the in-kernel f32 recurrence, round 5) vs
    exact_carrier=True's native host track on the same unsplit fused
    program. The two integrate slightly different frequency streams (the
    native pre-pass runs the ORACLE's chain — f32 countdown sequencer —
    while the kernel integrates its own device chain), so agreement is
    bounded-ulp, not bit: both are exact f32 recurrences with NO drift
    term, which is what the long-form fidelity rows gate."""
    kw = dict(voice="plain", language="english")
    a = synthesize_batch(["hello there"], backend="fused_interpret",
                         exact_carrier="kernel", **kw)[0]
    b = synthesize_batch(["hello there"], backend="fused_interpret",
                         exact_carrier=True, **kw)[0]
    np.testing.assert_allclose(a, b, atol=5e-5, rtol=0)


def test_inkernel_carrier_matches_scan_chain():
    """The in-kernel recurrence consumes the SAME device frequency chain as
    the lax.scan reference core (which steps the reference f32 carrier
    natively), so kcar vs scan isolates the filter implementations'
    coefficient re-association — a few ulps, duration-independent."""
    kw = dict(voice="plain", language="english")
    a = synthesize_batch(["hello there"], backend="fused_interpret",
                         exact_carrier="kernel", **kw)[0]
    b = synthesize("hello there", use_scan=True, **kw)
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=0)


@needs_native
def test_inkernel_carrier_batched_lanes():
    """The in-kernel recurrence is per-lane: a multi-utterance batch with
    distinct texts/seeds must match the per-utterance host-track runs
    within the bounded-ulp envelope (see above)."""
    texts = ["hello there", "say hi", "guten tag"]
    kw = dict(voice="plain", language="english")
    outs = synthesize_batch(texts, seeds=[0, 1, 2],
                            backend="fused_interpret",
                            exact_carrier="kernel", **kw)
    for t, sd, got in zip(texts, [0, 1, 2], outs):
        ref = synthesize_batch([t], seeds=[sd], backend="fused_interpret",
                               exact_carrier=True, **kw)[0]
        np.testing.assert_allclose(got, ref, atol=5e-5, rtol=0)


def test_stream_session_carrier_is_exact():
    """StreamSession blocks carry the exact f32 carrier in SynthState.phase
    (round 5): chained session reads match the one-shot in-kernel batch
    run (same carrier recurrence; xla-core filters vs kernel-loop filters
    differ only by coefficient re-association ulps)."""
    from grail_tpu.runtime.stream import StreamSession
    from grail_tpu.utils import sample_error_db

    batch = synthesize_batch(["hello there"], backend="fused_interpret",
                             exact_carrier="kernel",
                             voice="plain", language="english")[0]
    s = StreamSession(voice="plain", language="english", block=1024)
    s.feed("hello there")
    s.flush()
    stream = s.read(len(batch))
    assert sample_error_db(stream, batch) < -90


def test_split_carrier_preroll_cycle():
    """Segment 0's virtual pre-roll reproduces the Q32 silent-warmup phase
    cycle {0, .25, .5, .75} and the first real sample lands on track[0];
    later segments read the flat track at their absolute offsets."""
    T, S = 8192, 4
    Ts = T // S
    track = (np.arange(T, dtype=np.float32) * np.float32(0.001)) % 1.0
    seg = np.asarray(_split_carrier(track, T, S))
    assert seg.shape == (Ts + WARMUP, S)
    # pre-roll cycle, aligned so phase 0 recurs at the first real sample
    expect_pre = (np.arange(WARMUP) % 4).astype(np.float32) * 0.25
    np.testing.assert_array_equal(seg[:WARMUP, 0], expect_pre)
    assert seg[WARMUP, 0] == track[0]
    full = np.concatenate([expect_pre, track])
    for k in range(1, S):
        np.testing.assert_array_equal(seg[:, k],
                                      full[k * Ts: k * Ts + Ts + WARMUP])


def test_exact_carrier_without_native(monkeypatch):
    """Since round 5 exact_carrier=True/'kernel' needs NO native pre-pass:
    the device f32 recurrence satisfies it on fused (in-kernel) and xla
    (carrier_scan) alike. The xla device recurrence must agree with the
    scan core (which steps the same recurrence natively) to filter-impl
    ulps, and the round-1 pallas backend still fails loudly."""
    import grail_tpu.api as api
    monkeypatch.setattr(api, "_carrier_track_for", lambda *a, **k: None)
    kw = dict(voice="generic", language="generic")
    out_x = synthesize("aeae", backend="xla", exact_carrier=True, **kw)
    out_s = synthesize("aeae", use_scan=True, **kw)
    np.testing.assert_allclose(out_x, out_s, atol=1e-5, rtol=0)
    out_k = synthesize("aeae", backend="fused_interpret",
                       exact_carrier=True, **kw)
    assert np.isfinite(out_k).all() and len(out_k) > 0
    with pytest.raises(ValueError, match="carrier"):
        synthesize_batch(["aeae"], backend="pallas_interpret",
                         exact_carrier="kernel", **kw)
    # auto: no error, Q32 result (short utterance)
    out = synthesize("aeae", backend="xla", **kw)
    assert np.isfinite(out).all() and len(out) > 0


def test_exact_carrier_auto_duration_gate(monkeypatch):
    """Auto mode (exact_carrier=None) engages the pre-pass only past
    EXACT_CARRIER_AUTO_SECONDS: short utterances keep the Q32 carrier
    (> 8 dB of measured gate margin below 30 s) and skip the O(T) host
    pre-pass + 4 B/sample upload; long ones pay it (Q32 alone fails the
    gate past ~80 s — see the measured curve at api.py's constant)."""
    from grail_tpu import api
    from grail_tpu.text.intonate import PhonemeElem
    from grail_tpu.text.phonemes import Phoneme

    calls = []

    def spy(pelems, v, seed):
        calls.append(sum(p.length for p in pelems))
        return None                      # auto tolerates an unbuilt native

    monkeypatch.setattr(api, "_carrier_track_for", spy)
    synthesize("aeae", voice="generic", language="generic", backend="xla")
    assert calls == []                   # ~1.2 s utterance: auto stays off

    long_pelems = [PhonemeElem(Phoneme.A, 1.0, 0.5, 120.0 / 44100.0)] * 31
    assert api._wants_exact_carrier(long_pelems)
    assert not api._wants_exact_carrier(long_pelems[:29])
