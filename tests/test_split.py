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
    from grail_tpu.api import WARMUP
    from grail_tpu.synth.schedule import device_window

    sched_w = device_window(voice.jitter_frequency, -WARMUP, T + WARMUP)
    sched = device_window(voice.jitter_frequency, 0, T)
    out_split = np.asarray(_synth_jit_split(batched, lattices, jp,
                                            jnp.float32(sr), sched_w, T, S))
    out_ref = np.asarray(_synth_jit_batch(batched, lattices, jp,
                                          jnp.float32(sr), sched, T, "xla"))
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


def test_choose_split_cost_model():
    """The split decision minimizes total lane-samples (incl. WARMUP
    pre-rolls) against unsplit 128-lane padding (VERDICT r2 #2: B=1 must
    reach full occupancy for normal utterance lengths)."""
    from grail_tpu.api import _choose_split

    # B=1, 2 s utterance: 128-way split (4096-sample segments) beats
    # re-rendering 2 s in each of 128 padded lanes
    S, T = _choose_split(1, 88200, "fused")
    assert S == 128 and T == 128 * 4096
    # tiny utterance: warmup would dominate; unsplit wins
    assert _choose_split(1, 4096, "fused")[0] == 1
    # B=64: S=2 fills the tile (the r2-measured win)
    assert _choose_split(64, 264600, "fused")[0] == 2
    # full tile already: never split
    assert _choose_split(128, 264600, "fused")[0] == 1
    # non-power-of-two batch fills whole tiles via gcd
    S, _ = _choose_split(3, 264600, "fused")
    assert (S * 3) % 128 == 0 and S > 1
    # xla path never splits
    assert _choose_split(1, 264600, "xla")[0] == 1


def test_solo_score_routes_to_production_split_path():
    """synthesize_score/synthesize on a kernel backend runs the same
    lane-splitting program as the batch path (B=1), matching the XLA
    reference core (VERDICT r2 #2)."""
    from grail_tpu.api import synthesize_score, synthesize_scores, text_to_score

    score = text_to_score("aeae")
    out = synthesize_scores([score], "generic", backend="pallas")[0]
    ref = synthesize_score(score, "generic", backend="xla")
    assert out.shape == ref.shape
    assert sample_error_db(out, ref) < -60


@pytest.mark.parametrize("rate", [22050.0, 48000.0])
def test_split_fused_resampled_rate(rate):
    """Split-fused at non-default sample rates: segment 0's masked pre-roll
    freezes the jitter cell track for WARMUP samples, so its lattice
    pre-shift must be solved from the schedule, not the lane start cell —
    at 22.05 kHz the W*inc offset (2.97 rows) blew the grid window cushion
    and silently zeroed segment-0 jitter (rate22050 fused regression,
    FIDELITY_r04 capture)."""
    from grail_tpu.api import _split_sched, _synth_jit_split_fused
    from grail_tpu.synth.schedule import device_window

    voice = get_voice("generic").resampled(rate)
    sr = float(voice.sample_rate)
    score = text_to_score("aeae", voice=voice)
    N = _score_num_samples(score, sr)
    S = 4
    T = _round_up(N, S * 4096)
    lat = build_lattice(0, T, voice.jitter_frequency)
    lattices = JitterLattice(*(f[None] for f in lat))
    batched = stack_scores([score])
    jp = tuple(jnp.float32(x) for x in (
        voice.jitter_frequency, voice.jitter_delta_frequency,
        voice.jitter_delta_formant_frequency, voice.jitter_delta_amplitude))
    inc = voice.jitter_frequency
    pre, seg, shift = _split_sched(inc, T, S)
    out = np.asarray(_synth_jit_split_fused(
        batched, lattices, jp, jnp.float32(sr), pre, seg, shift, T, S,
        interpret=True))
    sched = device_window(inc, 0, T)
    ref = np.asarray(_synth_jit_batch(batched, lattices, jp,
                                      jnp.float32(sr), sched, T, "xla"))
    assert sample_error_db(out[0, :N], ref[0, :N]) < -90
    assert np.abs(out[0, :N] - ref[0, :N]).max() < 1e-4
