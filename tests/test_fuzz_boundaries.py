"""Randomized boundary-geometry equivalence: fused kernel vs XLA path.

The fused kernel's hairiest logic is per-chunk: the 3-row element-basis
selection assumes a chunk meets at most one element boundary, and the
jitter-lattice window is scalar-indexed from the grid position. This fuzz
sweep builds scores whose element boundaries land EXACTLY on a CHUNK_F
edge, and +-1 sample around it — the ambiguity cases a text-derived score
almost never produces — and requires the fused output to match the XLA
expansion path everywhere (energy + max-abs, same gates as test_fused).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from grail_tpu.api import _round_up, _score_num_samples, _synth_jit_batch
from grail_tpu.synth.jitter import JitterLattice, build_lattice
from grail_tpu.synth.kernel_fused import CHUNK_F, fused_supported
from grail_tpu.synth.score import score_from_phoneme_elems, stack_scores
from grail_tpu.text.intonate import PhonemeElem
from grail_tpu.text.phonemes import Phoneme
from grail_tpu.utils import sample_error_db
from grail_tpu.voices import get_voice

SR = 44100.0


def _boundary_score(rng, voice, E, pad_to):
    """Random score whose element end-samples hit chunk-edge +- {1,0,-1}."""
    # boundary samples near CHUNK_F multiples, spaced >= 2 chunks so the
    # +-1 jitter can't shrink any gap below the kernel's >= CHUNK_F
    # precondition (fused_supported)
    mults = np.cumsum(rng.integers(2, 6, size=E)) + 3
    jitter_off = rng.choice([-1, 0, 1], size=E)
    n = mults * CHUNK_F + jitter_off                     # end samples
    # lengths such that floor(cumsum(length)*sr) == n exactly: target the
    # middle of the [n, n+1) sample bin
    C = (n.astype(np.float64) + 0.5) / SR
    lengths = np.diff(np.concatenate([[0.0], C]))

    sounds = [Phoneme.A, Phoneme.E, Phoneme.SILENCE]
    pelems = []
    for i in range(E):
        ph = sounds[int(rng.integers(0, len(sounds)))]
        blend = float(rng.uniform(0.3, 1.0)) * lengths[i]
        pelems.append(PhonemeElem(ph, float(lengths[i]), blend,
                                  float(rng.uniform(100.0, 140.0)) / SR))
    return score_from_phoneme_elems(pelems, voice, pad_to=pad_to)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fused_matches_xla_on_chunk_edge_boundaries(seed):
    rng = np.random.default_rng(seed)
    voice = get_voice("generic")
    B, E = 4, 5
    scores = [_boundary_score(rng, voice, E, pad_to=E + 1) for _ in range(B)]
    batched = stack_scores(scores)
    assert fused_supported(batched, SR)   # geometry respects preconditions

    Ns = [_score_num_samples(s, SR) for s in scores]
    T = _round_up(max(Ns), 4096)
    lattices = [build_lattice(seed * 10 + i, T, voice.jitter_frequency)
                for i in range(B)]
    lattices = JitterLattice(*(np.stack(f) for f in zip(*lattices)))
    jp = tuple(jnp.float32(x) for x in (
        voice.jitter_frequency, voice.jitter_delta_frequency,
        voice.jitter_delta_formant_frequency, voice.jitter_delta_amplitude))

    from grail_tpu.synth.schedule import device_window

    sched = device_window(voice.jitter_frequency, 0, T)
    ref = np.asarray(_synth_jit_batch(batched, lattices, jp, jnp.float32(SR),
                                      sched, T, "xla"))
    out = np.asarray(_synth_jit_batch(batched, lattices, jp, jnp.float32(SR),
                                      sched, T, "fused_interpret"))
    for b in range(B):
        assert sample_error_db(out[b, :Ns[b]], ref[b, :Ns[b]]) < -60, b
    assert np.abs(out - ref).max() < 5e-4


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_streamed_feed_chunking_invariant(seed):
    """Feeding text in arbitrary random chunks (splitting digraphs and
    whole words anywhere) must transcribe to the same phoneme stream as
    feeding it at once — the incremental transcriber's held-match logic
    under fuzzed split points."""
    from grail_tpu import languages
    from grail_tpu.runtime.stream import StreamSession
    from grail_tpu.text.transcribe import transcribe_chars

    rng = np.random.default_rng(seed)
    text = "she pushed the fish to the shore with a thin stick"
    eng = languages.get_language("english")
    # the session seeds the frontend's reference-parity leading Silence
    # (transcribe(..., leading_silence=True)) before the first utterance
    whole = [Phoneme.SILENCE] + list(transcribe_chars(text, eng))

    s = StreamSession(voice="plain", language="english")
    i = 0
    while i < len(text):
        step = int(rng.integers(1, 4))
        s.feed(text[i:i + step])
        i += step
    s.flush()
    streamed = [pe.phoneme for pe in s._elements]
    assert streamed == whole


@pytest.mark.parametrize("seed", [0, 1])
def test_pool_matches_solo_under_random_interleaving(seed):
    """StreamPool under a randomized feed/tick schedule must match
    independent solo sessions driven by the same schedule — the pooled
    tick's per-session offset/jitter bookkeeping under irregular text
    arrival and idle gaps."""
    from grail_tpu.runtime.stream import StreamPool, StreamSession

    rng = np.random.default_rng(seed)
    N, blk, ticks = 2, 1024, 6
    words = ["hello ", "push ", "aeio ", "fish "]
    # schedule[t][i] = text session i receives just before tick t (or None)
    schedule = [[words[int(rng.integers(0, 4))]
                 if rng.random() < 0.4 else None
                 for _ in range(N)] for _ in range(ticks)]

    pool = StreamPool(N, voice="plain", language="english", block=blk,
                      backend="fused_interpret")
    pooled = []
    for t in range(ticks):
        for i, txt in enumerate(schedule[t]):
            if txt is not None:
                pool.feed(i, txt)
                pool.flush(i)
        pooled.append(pool.read_block())
    pooled = np.concatenate(pooled, axis=1)

    for i in range(N):
        s = StreamSession(voice="plain", language="english", seed=i,
                          block=blk)
        solo = []
        for t in range(ticks):
            if schedule[t][i] is not None:
                s.feed(schedule[t][i])
                s.flush()
            solo.append(s.read())
        solo = np.concatenate(solo)
        assert sample_error_db(pooled[i], solo) < -60, (seed, i)
