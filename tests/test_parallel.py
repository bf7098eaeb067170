"""Multi-chip sharding on the 8-device virtual CPU mesh: dp + sp."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grail_tpu.parallel.sharded import make_mesh, sharded_pipeline, synthesize_block_sp
from grail_tpu.synth.elem import SynthesisElem
from grail_tpu.synth.synthesize import SynthState, synthesize_block
from grail_tpu.utils import sample_error_db

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


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


@pytest.mark.parametrize("n_data,n_seq", [(2, 4), (4, 2), (1, 8), (8, 1)])
def test_sp_core_matches_single_device(n_data, n_seq):
    T, B = 8192, 8
    e = _elems(T, B)
    mesh = make_mesh(n_data, n_seq)
    out_sp, st_sp = jax.jit(lambda x: synthesize_block_sp(x, mesh))(e)
    out_1, st_1 = jax.jit(lambda x: synthesize_block(x, block_size=T))(e)
    assert sample_error_db(np.asarray(out_sp), np.asarray(out_1)) < -100
    # phase and RNG state must be exact; filters to float precision
    np.testing.assert_array_equal(np.asarray(st_sp.seed), np.asarray(st_1.seed))
    np.testing.assert_allclose(np.asarray(st_sp.phase), np.asarray(st_1.phase), atol=1e-6)
    for a, b in ((st_sp.filter_state_a, st_1.filter_state_a),
                 (st_sp.filter_state_b, st_1.filter_state_b),
                 (st_sp.filter_state_c, st_1.filter_state_c)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sp_state_continuation():
    # sp state out feeds a subsequent sp block: must match one long block
    T, B = 8192, 4
    e = _elems(2 * T, B, seed=1)
    mesh = make_mesh(2, 4)
    e1 = SynthesisElem(*(f[:T] for f in e))
    e2 = SynthesisElem(*(f[T:] for f in e))
    h1, st = jax.jit(lambda x: synthesize_block_sp(x, mesh))(e1)
    h2, st2 = jax.jit(lambda x, s: synthesize_block_sp(x, mesh, s))(e2, st)
    full, _ = jax.jit(lambda x: synthesize_block(x, block_size=2 * T))(e)
    got = np.concatenate([np.asarray(h1), np.asarray(h2)])
    assert sample_error_db(got, np.asarray(full)) < -100


def test_full_sharded_pipeline_matches_single():
    from grail_tpu.api import (_round_up, _score_num_samples, _synth_jit_batch,
                               text_to_score)
    from grail_tpu.synth.jitter import JitterLattice, build_lattice
    from grail_tpu.synth.score import stack_scores
    from grail_tpu.voices import get_voice

    B = 4
    texts = ["ae", "ea", "aa", "ee"]
    voice = get_voice("generic")
    sr = float(voice.sample_rate)
    E = max(text_to_score(t).num_elems for t in texts)
    scores = [text_to_score(t, pad_to=E) for t in texts]
    T = _round_up(max(_score_num_samples(s, sr) for s in scores), 8192)
    lattices = [build_lattice(i, T, voice.jitter_frequency) for i in range(B)]
    lattices = JitterLattice(*(np.stack(f) for f in zip(*lattices)))
    batched = stack_scores(scores)
    jp = tuple(jnp.float32(x) for x in (
        voice.jitter_frequency, voice.jitter_delta_frequency,
        voice.jitter_delta_formant_frequency, voice.jitter_delta_amplitude))
    mesh = make_mesh(2, 4)
    out_sp = jax.jit(lambda s, l: sharded_pipeline(
        s, l, jp, jnp.float32(sr), T, mesh))(batched, lattices)
    from grail_tpu.synth.schedule import device_window

    out_ref = _synth_jit_batch(batched, lattices, jp, jnp.float32(sr),
                               device_window(voice.jitter_frequency, 0, T),
                               T, "xla")
    assert sample_error_db(np.asarray(out_sp), np.asarray(out_ref)) < -100


def test_sharded_stream_pool_matches_unsharded():
    """Multi-chip serving: a StreamPool with sessions sharded over the
    'data' mesh axis matches the single-device pool to ~1 ulp (the
    per-lane math is lane-count independent; XLA's shape-dependent FMA
    contraction introduces last-bit differences)."""
    from grail_tpu.runtime.stream import StreamPool

    N, blk, ticks = 8, 1024, 3
    texts = ["hello", "world", "aeio", "tpu go"]
    mesh = make_mesh(4, 1)

    def run(mesh_arg):
        pool = StreamPool(N, voice="plain", language="english", block=blk,
                          backend="fused_interpret", mesh=mesh_arg)
        for i, t in enumerate(texts):
            pool.feed(i, t)
            pool.flush(i)
        return np.concatenate([pool.read_block() for _ in range(ticks)],
                              axis=1)

    sharded = run(mesh)
    plain = run(None)
    np.testing.assert_allclose(sharded, plain, atol=2e-6)
    assert sample_error_db(sharded.ravel(), plain.ravel()) < -100


def test_sharded_stream_pool_rejects_bad_config():
    from grail_tpu.runtime.stream import StreamPool

    mesh = make_mesh(4, 1)
    with pytest.raises(ValueError):
        StreamPool(6, mesh=mesh, backend="fused_interpret")  # 6 % 4 != 0
    with pytest.raises(ValueError):
        StreamPool(8, mesh=mesh, backend="xla")


def test_sharded_pool_serve_mode_matches_read_block():
    """Multi-chip SERVING in serve mode: the async-frontend split runs the
    mesh-sharded tick program and matches the sharded read_block path
    bit-exactly (same program, same inputs — the RT thread only dispatches).
    Previously serve_start raised NotImplementedError on a mesh."""
    from grail_tpu.runtime.stream import StreamPool

    N, blk, ticks = 8, 1024, 6
    texts = ["hello", "world", "aeio", "tpu go"]
    mesh = make_mesh(4, 1)

    def mk():
        pool = StreamPool(N, voice="plain", language="english", block=blk,
                          backend="fused_interpret", mesh=mesh)
        for i, t in enumerate(texts):
            pool.feed(i, t)
            pool.flush(i)
        return pool

    ref_pool = mk()
    ref = [np.asarray(ref_pool.read_block()) for _ in range(ticks)]

    pool = mk()
    pool.serve_start(period=9999)   # frontend idles; builds driven explicitly
    try:
        got = []
        for k in range(ticks):
            if k == 3:
                pool.feed(1, " more")
                pool.flush(1)
                pool._serve_build()
            got.append(np.asarray(pool.serve_tick()))
    finally:
        pool.serve_stop()

    for k in range(3):              # identical pools before the extra feed
        np.testing.assert_array_equal(got[k], ref[k])
    for k in range(ticks):          # the feed only ever touches session 1
        np.testing.assert_array_equal(
            got[k][[0, 2, 3, 4, 5, 6, 7]], ref[k][[0, 2, 3, 4, 5, 6, 7]])
