"""Overlap-save sequence splitting: split path vs unsplit equivalence.

The split path (api._synth_jit_split) runs each utterance's time axis in S
segments on separate kernel lanes, re-deriving filter state from a WARMUP
pre-roll (stable IIRs forget in ~200 samples) while carrier phase and RNG
continue exactly (Q32 pre-pass integral + Lehmer skip-ahead). Kernel runs in
interpreter mode on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import grail_tpu.synth.kernel as kernel_mod
from grail_tpu.api import (_round_up, _score_num_samples, _synth_jit_batch,
                           _synth_jit_split, text_to_score)
from grail_tpu.synth.jitter import JitterLattice, build_lattice
from grail_tpu.synth.score import stack_scores
from grail_tpu.synth.sequencer import expand_frequency, expand_score
from grail_tpu.utils import sample_error_db
from grail_tpu.voices import get_voice


@pytest.fixture(autouse=True)
def _interpret_kernel(monkeypatch):
    orig = kernel_mod.synth_core_pallas
    monkeypatch.setattr(kernel_mod, "synth_core_pallas",
                        lambda e, s, interpret=False: orig(e, s, interpret=True))


def test_split_matches_unsplit():
    B, S = 2, 4
    texts = ["aeae", "eaae"]
    voice = get_voice("generic")
    sr = float(voice.sample_rate)
    E = max(text_to_score(t).num_elems for t in texts)
    scores = [text_to_score(t, pad_to=E) for t in texts]
    Ns = [_score_num_samples(s, sr) for s in scores]
    T = _round_up(max(Ns), S * 4096)
    lattices = [build_lattice(i, T, voice.jitter_frequency) for i in range(B)]
    lattices = JitterLattice(*(np.stack(f) for f in zip(*lattices)))
    batched = stack_scores(scores)
    jp = tuple(jnp.float32(x) for x in (
        voice.jitter_frequency, voice.jitter_delta_frequency,
        voice.jitter_delta_formant_frequency, voice.jitter_delta_amplitude))
    out_split = np.asarray(_synth_jit_split(batched, lattices, jp,
                                            jnp.float32(sr), T, S))
    out_ref = np.asarray(_synth_jit_batch(batched, lattices, jp,
                                          jnp.float32(sr), T, "xla"))
    for b in range(B):
        assert sample_error_db(out_split[b, :Ns[b]], out_ref[b, :Ns[b]]) < -90
    # no seam artifacts: absolute error bounded everywhere
    assert np.abs(out_split - out_ref).max() < 1e-4


def test_expand_frequency_matches_expand_score():
    # the split pre-pass integrates expand_frequency; it must be
    # arithmetic-identical to expand_score's frequency output
    voice = get_voice("generic")
    score = text_to_score("aeea", voice)
    T = 32768
    f1, v1 = jax.jit(lambda s: expand_frequency(s, 44100.0, T, offset=0))(score)
    elems, v2 = jax.jit(lambda s: expand_score(s, 44100.0, T, offset=0))(score)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(elems.frequency))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_synthesize_batch_autosplit():
    # public API path: B=2 on the pallas_interpret backend stays unsplit
    # (interpret excluded); explicit split equivalence is covered above.
    from grail_tpu.api import synthesize_batch

    outs = synthesize_batch(["ae", "ea"], backend="pallas_interpret")
    ref = synthesize_batch(["ae", "ea"], backend="xla")
    for a, b in zip(outs, ref):
        assert sample_error_db(a, b) < -55
