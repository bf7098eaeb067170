"""Pallas kernel equivalence (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grail_tpu.synth.elem import SynthesisElem
from grail_tpu.synth.kernel import CHUNK, LANE, synth_core_pallas
from grail_tpu.synth.synthesize import SynthState, synthesize_scan


def _elems(T, B, seed=0):
    rng = np.random.default_rng(seed)
    return SynthesisElem(
        frequency=jnp.asarray(np.full((T, B), 0.003, np.float32)),
        formant_freq=jnp.asarray((0.02 + 0.05 * rng.random((T, B, 8))).astype(np.float32)),
        formant_bw=jnp.asarray(np.full((T, B, 8), 0.002, np.float32)),
        formant_smooth=jnp.asarray(np.full((T, B, 8), 0.036, np.float32)),
        formant_breath=jnp.asarray(np.full((T, B, 8), 0.3, np.float32)),
        formant_turb=jnp.asarray(np.full((T, B, 8), 0.2, np.float32)),
        formant_amp=jnp.asarray(np.full((T, B, 8), 0.125, np.float32)),
    )


def test_kernel_matches_scan_core():
    T, B = 2 * CHUNK, LANE
    e = _elems(T, B)
    audio, st = jax.jit(lambda x, s: synth_core_pallas(x, s, interpret=True)
                        )(e, SynthState.init((B,)))
    gold, gst = jax.jit(synthesize_scan)(e)
    # the kernel reassociates v1 = (b'+b)/2 and folds v0 into q1/q2 —
    # algebraically identical, rounds differently at the ~1e-5 level
    from grail_tpu.utils import sample_error_db
    assert sample_error_db(np.asarray(audio).ravel(), np.asarray(gold).ravel()) < -55
    for a, b in zip(st, gst):
        np.testing.assert_allclose(np.asarray(a).astype(np.float64),
                                   np.asarray(b).astype(np.float64), atol=2e-4)


def test_kernel_state_continuity():
    T, B = 2 * CHUNK, LANE
    e = _elems(T, B, seed=3)
    run = jax.jit(lambda x, s: synth_core_pallas(x, s, interpret=True))
    full, st_full = run(e, SynthState.init((B,)))
    e1 = SynthesisElem(*(f[:CHUNK] for f in e))
    e2 = SynthesisElem(*(f[CHUNK:] for f in e))
    h1, st1 = run(e1, SynthState.init((B,)))
    h2, st2 = run(e2, st1)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(h1), np.asarray(h2)]), np.asarray(full), atol=1e-6)
    for a, b in zip(st2, st_full):
        np.testing.assert_allclose(np.asarray(a).astype(np.float64),
                                   np.asarray(b).astype(np.float64), atol=1e-6)


def test_pipeline_pallas_interpret_matches_xla():
    from grail_tpu.api import synthesize_batch

    outs_p = synthesize_batch(["ae"], backend="pallas_interpret")
    outs_x = synthesize_batch(["ae"], backend="xla")
    from grail_tpu.utils import sample_error_db
    assert sample_error_db(outs_p[0], outs_x[0]) < -55
