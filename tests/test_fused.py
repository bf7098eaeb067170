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


def test_fused_matches_xla_batch():
    batched, lattices, jp, sr, T, Ns = _setup(["ae", "ea", "aa", "ee"])
    ref = np.asarray(_synth_jit_batch(batched, lattices, jp, sr, T, "xla"))
    out = np.asarray(_synth_jit_batch(batched, lattices, jp, sr, T,
                                      "fused_interpret"))
    assert out.shape == ref.shape
    for b in range(len(Ns)):
        assert sample_error_db(out[b, :Ns[b]], ref[b, :Ns[b]]) < -60
    assert np.abs(out - ref).max() < 5e-4


def test_fused_split_matches_unsplit():
    batched, lattices, jp, sr, T, Ns = _setup(["aeae", "eaae"], S=4)
    out = np.asarray(_synth_jit_split_fused(batched, lattices, jp, sr, T, 4,
                                            interpret=True))
    ref = np.asarray(_synth_jit_batch(batched, lattices, jp, sr, T, "xla"))
    for b in range(len(Ns)):
        assert sample_error_db(out[b, :Ns[b]], ref[b, :Ns[b]]) < -60
    # no seam artifacts anywhere (segment joins at T/4 boundaries)
    assert np.abs(out - ref).max() < 1e-3


def test_fused_state_continuation():
    # two chained half-length calls == one full-length call (streaming use)
    batched, lattices, jp, sr, T, Ns = _setup(["aeaeae", "eaeaea"])
    tables = build_tables(batched, lattices, jp, sr)
    full, _ = synth_fused_pallas(tables, T, interpret=True)

    B = 2
    half = T // 2
    a1, st = synth_fused_pallas(tables, half, interpret=True)
    tables2 = build_tables(batched, lattices, jp, sr,
                           g0=jnp.full((B,), half, jnp.int32))
    a2, _ = synth_fused_pallas(tables2, half, state=st, interpret=True)
    out = np.concatenate([np.asarray(a1), np.asarray(a2)], axis=0)
    # f32 phase handoff quantizes at 2^-25 cycles; everything else is exact
    np.testing.assert_allclose(out, np.asarray(full), atol=2e-5)


def test_fused_supported_guard():
    score = text_to_score("ae")
    assert fused_supported(score, 44100.0)
    tiny = Score(elem=score.elem, has_sound=score.has_sound,
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
