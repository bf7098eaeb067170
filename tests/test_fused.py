"""Fully-fused kernel (kernel_fused.py): equivalence vs the XLA paths.

The fused kernel runs score expansion + jitter + DSP in one Pallas program
(interpret mode here). Its only intended numerical divergence from the XLA
associative-scan path is the carrier phase accumulator: Q32 wrapping-int32 fixed
point instead of Q32 uint32 — a 2^-32/sample quantization, far below the
-60 dB budget.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grail_tpu.api import (_round_up, _score_num_samples, _synth_jit_batch,
                           _synth_jit_split_fused, text_to_score)
from grail_tpu.synth.jitter import JitterLattice, build_lattice
from grail_tpu.synth.kernel_fused import (build_tables, fused_supported,
                                          synth_fused_pallas)
from grail_tpu.synth.score import Score, stack_scores
from grail_tpu.synth.synthesize import SynthState
from grail_tpu.utils import sample_error_db
from grail_tpu.voices import get_voice


def _setup(texts, S=1, seeds=None):
    voice = get_voice("generic")
    sr = float(voice.sample_rate)
    E = max(text_to_score(t).num_elems for t in texts)
    scores = [text_to_score(t, pad_to=E) for t in texts]
    Ns = [_score_num_samples(s, sr) for s in scores]
    T = _round_up(max(Ns), S * 4096)
    seeds = seeds or list(range(len(texts)))
    lattices = [build_lattice(sd, T, voice.jitter_frequency) for sd in seeds]
    lattices = JitterLattice(*(np.stack(f) for f in zip(*lattices)))
    jp = tuple(jnp.float32(x) for x in (
        voice.jitter_frequency, voice.jitter_delta_frequency,
        voice.jitter_delta_formant_frequency, voice.jitter_delta_amplitude))
    return stack_scores(scores), lattices, jp, jnp.float32(sr), T, Ns


def _sched1(jp, T, start=0):
    """Exact schedule as flat [T] arrays (XLA-path shape)."""
    from grail_tpu.synth.schedule import device_window

    return device_window(float(jp[0]), start, T)


def _sched2(jp, T, start=0):
    """Exact schedule as shared-lane [T, 1] kernel inputs."""
    phi, cell = _sched1(jp, T, start)
    return phi[:, None], cell[:, None]


def test_fused_matches_xla_batch():
    batched, lattices, jp, sr, T, Ns = _setup(["ae", "ea", "aa", "ee"])
    sched = _sched1(jp, T)
    ref = np.asarray(_synth_jit_batch(batched, lattices, jp, sr, sched,
                                      T, "xla"))
    out = np.asarray(_synth_jit_batch(batched, lattices, jp, sr, sched, T,
                                      "fused_interpret"))
    assert out.shape == ref.shape
    for b in range(len(Ns)):
        assert sample_error_db(out[b, :Ns[b]], ref[b, :Ns[b]]) < -60
    assert np.abs(out - ref).max() < 5e-4


def test_fused_split_matches_unsplit():
    from grail_tpu.api import _split_sched

    batched, lattices, jp, sr, T, Ns = _setup(["aeae", "eaae"], S=4)
    pre, seg, shift = _split_sched(float(jp[0]), T, 4)
    out = np.asarray(_synth_jit_split_fused(batched, lattices, jp, sr,
                                            pre, seg, shift, T, 4,
                                            interpret=True))
    ref = np.asarray(_synth_jit_batch(batched, lattices, jp, sr,
                                      _sched1(jp, T), T, "xla"))
    for b in range(len(Ns)):
        assert sample_error_db(out[b, :Ns[b]], ref[b, :Ns[b]]) < -60
    # no seam artifacts anywhere (segment joins at T/4 boundaries)
    assert np.abs(out - ref).max() < 1e-3


def test_fused_state_continuation():
    # two chained half-length calls == one full-length call (streaming use)
    from grail_tpu.synth.schedule import get_schedule

    batched, lattices, jp, sr, T, Ns = _setup(["aeaeae", "eaeaea"])
    tables = build_tables(batched, lattices, jp, sr)
    full, _, _ = synth_fused_pallas(tables, T, sched=_sched2(jp, T),
                                    interpret=True)

    B = 2
    half = T // 2
    a1, st, _ = synth_fused_pallas(tables, half, sched=_sched2(jp, half),
                                   interpret=True)
    cell_half = get_schedule(float(jp[0])).state_at(half)[1]
    tables2 = build_tables(batched, lattices, jp, sr,
                           g0=jnp.full((B,), half, jnp.int32),
                           lat_shift=jnp.full((B,), cell_half, jnp.int32))
    a2, _, _ = synth_fused_pallas(tables2, half, state=st,
                                  sched=_sched2(jp, half, start=half),
                                  interpret=True)
    out = np.concatenate([np.asarray(a1), np.asarray(a2)], axis=0)
    # f32 phase handoff quantizes at 2^-25 cycles; everything else is exact
    np.testing.assert_allclose(out, np.asarray(full), atol=2e-5)


def test_fused_supported_guard():
    score = text_to_score("ae")
    assert fused_supported(score, 44100.0)
    tiny = Score.build(elem=score.elem, has_sound=score.has_sound,
                 length=np.asarray([0.001, 0.5], np.float32)[: score.num_elems]
                 if score.num_elems >= 2 else score.length,
                 blend_length=score.blend_length)
    assert not fused_supported(tiny, 44100.0)


def test_synthesize_batch_fused_backend():
    from grail_tpu.api import synthesize_batch

    outs = synthesize_batch(["ae", "ea"], backend="fused_interpret")
    ref = synthesize_batch(["ae", "ea"], backend="xla")
    for a, b in zip(outs, ref):
        assert sample_error_db(a, b) < -55


def test_synthesize_batch_fused_multivoice():
    # mixed voices in one fused device program == the same voices solo
    from grail_tpu.api import synthesize_batch

    outs = synthesize_batch(["aeae", "aeae"], voice=["plain", "bright"],
                            seeds=[1, 1], backend="fused_interpret")
    ref = synthesize_batch(["aeae", "aeae"], voice=["plain", "bright"],
                           seeds=[1, 1], backend="xla")
    for a, b in zip(outs, ref):
        assert sample_error_db(a, b) < -55
    # the two voices must actually differ audibly
    n = min(len(outs[0]), len(outs[1]))
    assert sample_error_db(outs[0][:n], outs[1][:n]) > -20


def test_stream_pool_fused_matches_solo():
    # batched serving on the fused kernel == independent XLA-path sessions
    from grail_tpu.runtime.stream import StreamPool, StreamSession

    N, blk, ticks = 3, 1024, 4
    pool = StreamPool(N, voice="plain", language="english", block=blk,
                      backend="fused_interpret")
    texts = ["hello", "world", "aeio"]
    for i, t in enumerate(texts):
        pool.feed(i, t)
        pool.flush(i)
    pooled = np.concatenate([pool.read_block() for _ in range(ticks)], axis=1)

    for i, t in enumerate(texts):
        s = StreamSession(voice="plain", language="english", seed=i, block=blk)
        s.feed(t)
        s.flush()
        solo = np.concatenate([s.read() for _ in range(ticks)])
        assert sample_error_db(pooled[i], solo) < -60


def test_fused_supported_zero_span_positions():
    # interior zero-length elements (duplicate boundary between two real
    # elements) break the kernel's 3-row vec basis (jb == ja + 2 across the
    # boundary) and must be rejected; leading (boundary still 0) and
    # trailing (padding) zero runs are safe and must stay accepted
    from types import SimpleNamespace

    def ln(*ls):
        ls = np.asarray(ls, np.float32)
        return SimpleNamespace(cum_length=np.cumsum(ls).astype(np.float32))

    assert not fused_supported(ln(0.5, 0.0, 0.5), 44100.0)     # interior
    assert fused_supported(ln(0.5, 0.5, 0.0, 0.0), 44100.0)    # trailing pad
    assert fused_supported(ln(0.0, 0.5, 0.5), 44100.0)         # leading
    assert fused_supported(ln(0.0, 0.0), 44100.0)              # all-degenerate
    # the jitter-rate precondition (inc * chunk < 1) is checked when given
    assert fused_supported(ln(0.5, 0.5), 44100.0, jitter_inc=0.001)
    assert not fused_supported(ln(0.5, 0.5), 44100.0, jitter_inc=0.01)


def test_api_falls_back_on_interior_zero_span():
    # a hand-built score with an interior zero-length element must route off
    # the fused kernel and still match the XLA backend
    from grail_tpu.api import synthesize_scores

    s = text_to_score("aea")
    lengths = np.asarray(s.length).copy()
    lengths[1] = 0.0
    z = Score.build(elem=s.elem, has_sound=s.has_sound,
              length=jnp.asarray(lengths), blend_length=s.blend_length)
    out = synthesize_scores([z], backend="fused_interpret")[0]
    ref = synthesize_scores([z], backend="xla")[0]
    assert sample_error_db(out, ref) < -60
    assert np.abs(out - ref).max() < 5e-4


def test_fused_boundary_selection_past_2p24_samples():
    # the intra-chunk boundary pick must use the exact int32 boundary: an
    # f32 copy flips vs the integer count past 2^24 samples (~380 s),
    # shifting an element boundary by one sample vs the XLA path
    from grail_tpu.synth.sequencer import expand_score
    from grail_tpu.synth.synthesize import synthesize_block

    sr = 44100.0
    voice = get_voice("generic")
    score = text_to_score("appa")      # [sil, a, sil, sil, a]
    lengths = np.asarray(score.length).copy()

    # Past 2^24 every f32 IS an integer, so the boundary value stays exact
    # — the flip comes from k1.astype(f32): the sample index n1 + 1 (odd,
    # a round-to-nearest-even tie in the spacing-2 region) rounds DOWN to
    # n1 whenever n1 % 4 == 0, so the f32 compare keeps the old element
    # for one extra sample. At this score's sound -> silence+silence
    # boundary that one sample applies the 0.25 silent-default carrier
    # frequency vs the voice's ~0.003 — a permanent ~quarter-cycle phase
    # displacement that turns audible when the final 'a' plays (the
    # documented -14 dB boundary-misalignment class). Craft the boundary
    # by stretching the first 'a' (element 1).
    l0 = np.float32(lengths[0])
    n1 = None
    c = np.float32(380.5)
    for _ in range(20000):
        C1 = np.float32(l0 + c)        # build_tables' f32 cumsum at elem 1
        cand = int(np.floor(C1 * np.float32(sr)))
        if cand > 2 ** 24 and cand % 4 == 0:
            n1 = cand
            break
        c = np.nextafter(c, np.float32(np.inf), dtype=np.float32)
    assert n1 is not None, "no mod-4 boundary found in scan range"
    assert int(np.float32(n1 + 1)) == n1     # the tie rounds down: k1f flips

    lengths[1] = float(c)
    long_score = Score.build(elem=score.elem, has_sound=score.has_sound,
                       length=jnp.asarray(lengths),
                       blend_length=score.blend_length)

    # window: straddle the boundary and run through the final 'a' where a
    # carrier phase displacement becomes full-scale audio error
    g0 = n1 - 128
    T = 55424                          # ~1.26 s, multiple of CHUNK_F
    # zero jitter deltas isolate the element-selection compare; the fused
    # kernel still runs its full jitter math (zero contribution)
    jp = tuple(jnp.float32(x) for x in (voice.jitter_frequency, 0.0, 0.0, 0.0))
    lat = JitterLattice(np.zeros(16, np.float32),
                        np.zeros((16, 8), np.float32),
                        np.zeros((16, 8), np.float32))

    elems, valid = expand_score(long_score, sr, T, offset=g0)
    ref, _ = synthesize_block(elems, SynthState.init(()), block_size=T)
    ref = np.asarray(ref) * np.asarray(valid)

    batched = stack_scores([long_score])
    lat_b = JitterLattice(*(f[None] for f in lat))
    tables = build_tables(batched, lat_b, jp, jnp.float32(sr),
                          g0=jnp.asarray([g0], jnp.int32),
                          lat_shift=jnp.zeros(1, jnp.int32))
    # zero deltas: any valid schedule works (zero contribution); zeros keep
    # the lattice reads on the zero rows
    zsched = (jnp.zeros((T, 1), jnp.float32), jnp.zeros((T, 1), jnp.int32))
    out, _, _ = synth_fused_pallas(tables, T, sched=zsched, interpret=True)
    out = np.asarray(out)[:, 0]
    # the correct (int32) compare leaves only the documented few-ulp SVF
    # re-association; the f32 compare fails this by ~full scale
    assert np.abs(out - ref).max() < 1e-4
