"""Core math: Lehmer RNG (sequential vs closed-form), approximations."""

import numpy as np
import pytest

from grail_tpu.core import rng as grng
from grail_tpu.core.approx import (exp_approx, np_exp_approx, np_tan_approx,
                                   tan_approx)
from grail_tpu.core.constants import LEHMER_A


def _sequential_states(seed, n):
    s = seed & 0xFFFFFFFF
    out = []
    for _ in range(n):
        s = (s * LEHMER_A + 1) & 0xFFFFFFFF
        out.append(s)
    return np.array(out, np.uint32)


@pytest.mark.parametrize("seed", [0, 1, 12345, 0xDEADBEEF, 0xFFFFFFFF])
def test_lehmer_closed_form_bit_exact(seed):
    n = 1000
    expected = _sequential_states(seed, n)
    got = grng.lehmer_states(seed, n)
    np.testing.assert_array_equal(got, expected)


def test_lehmer_affine_doubling_large():
    # the doubling construction must stay exact at awkward (non-power-of-2) sizes
    n = 3001
    expected = _sequential_states(7, n)
    np.testing.assert_array_equal(grng.lehmer_states(7, n), expected)


def test_float_conversion_bit_exact():
    # first draw from seed 0: state=1 -> bits 0x3F800000 -> 1.0 -> -1.0
    states = grng.lehmer_states(0, 4)
    f = grng.np_random_f32_from_state(states)
    assert f[0] == np.float32(-1.0)
    assert np.all(f >= -1.0) and np.all(f <= 1.0)
    # cross-check against the stateful oracle RNG
    r = grng.NpLehmer(0)
    seq = np.array([r.next_f32() for _ in range(4)], np.float32)
    np.testing.assert_array_equal(f, seq)


def test_device_lehmer_matches_host():
    import jax.numpy as jnp

    states_host = grng.lehmer_states(42, 256)
    states_dev = np.asarray(grng.device_lehmer_states(jnp.uint32(42), 256))
    np.testing.assert_array_equal(states_dev, states_host)
    # batched seeds
    seeds = np.array([0, 1, 99], np.uint32)
    batched = np.asarray(grng.device_lehmer_states(jnp.asarray(seeds), 64))
    for i, s in enumerate(seeds):
        np.testing.assert_array_equal(batched[i], grng.lehmer_states(int(s), 64))


def test_device_float_conversion():
    import jax.numpy as jnp

    states = grng.lehmer_states(3, 128)
    host = grng.np_random_f32_from_state(states)
    dev = np.asarray(grng.random_f32_from_state(jnp.asarray(states)))
    np.testing.assert_array_equal(dev, host)


def test_tan_approx_matches_reference_formula():
    x = np.linspace(0.001, 0.45, 100, dtype=np.float32)
    ours = np.asarray(tan_approx(x))
    ref = np_tan_approx(x)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
    # sanity: approximates tan(pi x) within a few percent mid-range
    true = np.tan(np.pi * x.astype(np.float64))
    rel = np.abs(ours - true) / np.abs(true)
    assert np.median(rel) < 0.05


def test_exp_approx_matches_reference_formula():
    x = np.linspace(0.0, 1.0, 100, dtype=np.float32)
    ours = np.asarray(exp_approx(x))
    ref = np_exp_approx(x)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
    true = np.exp(-2 * np.pi * x.astype(np.float64))
    assert np.max(np.abs(ours - true)) < 0.06


def test_lehmer_skip_matches_affine_tables():
    """Scalar O(log p) skip-ahead == the doubling-table construction (the
    split path uses the scalar form so multi-minute utterances don't embed
    length-T constants in the jit graph)."""
    from grail_tpu.core.rng import lehmer_affine, lehmer_skip

    powA, S = lehmer_affine(5000)
    for p in [0, 1, 2, 3, 17, 128, 4096, 4999]:
        a, b = lehmer_skip(p)
        assert a == int(powA[p]) and b == int(S[p]), p
